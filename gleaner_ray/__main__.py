"""CLI entry point — the reference's flag surface over the Ray pipeline.

Mirrors ``gleaner --cfg … [--source …] [--rude] [--setup] [--mode …]
[--address …] [--port …] [--log-level …]`` (/root/reference/cmd/
root.go:222-242) plus the Parquet-page data-plane flags this engine
adds (``--pages``, ``--out``, ``--cpus``). ``--source`` narrows the run
to one source and forces it active (root.go:80-110); ``--rude`` is only
meaningful with ``--source``, as in the reference (root.go:108-110).

Run: ``python -m gleaner_ray --cfg config.yml --pages /data/pages --out /data/run``
(also ``ray job submit -- python -m gleaner_ray …`` on a cluster).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def _ops_main(argv: list[str]) -> int:
    """``python -m gleaner_ray ops``: run any named operator pipeline
    from the query board over a table directory and write parquet —
    optionally hive-partitioned with per-partition resume markers
    (``sinks.write_partitioned``). The board lives in the repo-root
    driver contract (``__ray_entry__``), the single source of truth for
    operator names, so the CLI and the correctness driver can never
    disagree about what an operator computes."""
    import os

    ap = argparse.ArgumentParser(
        prog="gleaner_ray ops", description="run a named operator pipeline to parquet"
    )
    ap.add_argument("--query", default=None, help="board entry name (see --list)")
    ap.add_argument("--list", action="store_true", help="print available query names")
    ap.add_argument("--sf-dir", default=None, dest="sf_dir", help="input table directory")
    ap.add_argument("--out", default=None, help="output parquet directory")
    ap.add_argument(
        "--partition-by", default=None, dest="partition_by",
        help="hive-partition the output by this column (resumable: per-partition _SUCCESS markers)",
    )
    ap.add_argument("--no-resume", action="store_true", help="with --partition-by: rewrite everything")
    ap.add_argument("--cpus", type=int, default=None, help="ray.init num_cpus (local mode)")
    args = ap.parse_args(argv)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import __ray_entry__ as contract

    board = contract.queries()
    if args.list:
        print(json.dumps(sorted(board)))
        return 0
    if not args.query or not args.sf_dir or not args.out:
        ap.error("--query, --sf-dir and --out are required (or use --list)")
    if args.query not in board:
        ap.error("unknown query %r — see --list" % args.query)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        result = board[args.query](args.sf_dir)
        if isinstance(result, pd.DataFrame):
            result = rd.from_pandas(result)
        elif isinstance(result, pa.Table):
            result = rd.from_arrow(result)
        if args.partition_by:
            from .sinks import write_partitioned

            info = write_partitioned(
                result, args.out, by=args.partition_by, resume=not args.no_resume
            )
            rows = rd.read_parquet(args.out).count()
            print(json.dumps({"query": args.query, "rows": rows, "out": args.out, **info}))
        else:
            result.write_parquet(args.out)
            rows = rd.read_parquet(args.out).count()
            print(json.dumps({"query": args.query, "rows": rows, "out": args.out}))
        return 0
    finally:
        if owns_ray:
            ray.shutdown()


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "ops":
        return _ops_main(argv[1:])
    ap = argparse.ArgumentParser(prog="gleaner_ray", description="Ray-Data-native Gleaner harvester")
    ap.add_argument("--cfg", required=True, help="gleaner YAML config file")
    ap.add_argument("--source", default=None, help="run only this source (forces active)")
    ap.add_argument("--rude", action="store_true", help="ignore robots.txt (requires --source)")
    ap.add_argument("--setup", action="store_true", help="create the output bucket layout first")
    ap.add_argument("--mode", default=None, help="summoner mode override (full|diff)")
    ap.add_argument("--address", default=None, help="minio/object-store address override")
    ap.add_argument("--port", default=None, help="object-store port override")
    ap.add_argument("--log-level", default="INFO", dest="log_level")
    ap.add_argument("--pages", required=True, help="Common-Crawl-style pages Parquet path")
    ap.add_argument("--out", required=True, help="run output directory (objects/results/state)")
    ap.add_argument("--run-date", default=None, help="deterministic run date (YYYY-MM-DD)")
    ap.add_argument("--cpus", type=int, default=None, help="ray.init num_cpus (local mode)")
    ap.add_argument("--no-objects", action="store_true", help="skip summoned/prov/org object writes")
    ap.add_argument("--resume", action="store_true", help="preload seen set from prior runs")
    ap.add_argument(
        "--checkpoint-groups",
        type=int,
        default=0,
        dest="checkpoint_groups",
        help="split input files into N checkpointed groups; with --resume, finished groups are skipped",
    )
    args = ap.parse_args(argv)

    logging.basicConfig(level=getattr(logging, args.log_level.upper(), logging.INFO))

    from .config import GleanerConfig

    cfg = GleanerConfig.from_yaml(args.cfg)
    if args.rude and not args.source:
        ap.error("--rude requires --source")  # root.go:108-110
    if args.source:
        cfg.narrow_to_source(args.source)
    cfg.rude = args.rude
    if args.mode:
        cfg.summoner.mode = args.mode
    if args.address:
        cfg.minio.address = args.address
    if args.port:
        cfg.minio.port = int(args.port)
    cfg.summoner.validate()  # diff mode fails here, as resources.go:73-75

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from .pipelines.summon import summon

        run_date = args.run_date
        if run_date is None:
            import datetime

            run_date = datetime.date.today().isoformat()  # prov.go:117 semantics
        if args.setup:
            import os

            os.makedirs(args.out, exist_ok=True)
        if not cfg.summon:
            print(json.dumps({"skipped": "gleaner.summon is false"}))
            return 0
        manifest = summon(
            cfg,
            args.pages,
            args.out,
            run_date=run_date,
            write_objects=not args.no_objects,
            resume=args.resume,
            checkpoint_groups=args.checkpoint_groups,
        )
        print(json.dumps({k: v for k, v in manifest.items() if k != "seen_stats"}, indent=1))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
