"""Guard the driver-facing artifacts: modules import cleanly and the
entry contract exposes the required callables with consistent keys."""

import importlib
import sys


def test_driver_modules_import():
    sys.path.insert(0, "/root/repo")
    for mod in ("bench", "bench_scaling", "jobs.validate_clips", "__spark_entry__"):
        importlib.import_module(mod)


def test_entry_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs), "every oracle needs a queries() entry"
    # ≥ 2/3 of queries are value-verified against DuckDB
    assert len(oracles) * 3 >= len(qs) * 2
    assert callable(e.entry)


def test_job_cli_parses():
    from jobs.validate_clips import parse_args

    args = parse_args(["--clips", "/x", "--out", "/y", "--manifest", "/m", "--no-audio"])
    assert args.clips == "/x" and args.no_audio and args.manifest == "/m"
