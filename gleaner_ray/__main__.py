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


def main(argv: list[str] | None = None) -> int:
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
