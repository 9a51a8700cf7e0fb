"""CLI entry point: run the checkpointed KG job over a pages Parquet input.

Reference analog: scripts/run.py (main pipeline driver with --preset and
per-parameter overrides, run.py:106-199; override chain CLI > preset >
config default, extractor.py:65-97).

Examples:
    python scripts/run_kg.py --from-documents /root/testdata/sf0.001 \
        --output /tmp/kg_out --num-shards 4
    python scripts/run_kg.py --input /data/pages_parquet_dir \
        --output /tmp/kg_out --preset news --set processing.segment.target_chars=300
    # rerun after a crash: same command; committed shards are skipped.

Owns its Ray session (the driver-facing __ray_entry__ path never inits Ray).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_overrides(pairs: list[str]) -> dict:
    """--set a.b.c=value (value parsed as YAML scalar) -> nested dict."""
    import yaml

    out: dict = {}
    for pair in pairs:
        path, _, raw = pair.partition("=")
        node = out
        keys = path.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = yaml.safe_load(raw)
    return out


def shard_pages_parquet_factory(input_path: str):
    """Shard a pages Parquet file/dir by stable url hash — the single-file
    fallback; at real scale pass one directory of file shards per shard
    index so reads stay pruned (kgx.pipeline.run_kg docstring)."""
    import pyarrow as pa

    from kgx.functions.text import stable_hash64

    def make(k: int, num_shards: int):
        import ray.data as rd

        ds = rd.read_parquet(input_path)

        def pick(batch: pa.Table) -> pa.Table:
            mask = pa.array(
                [stable_hash64(u) % num_shards == k for u in batch["url"].to_pylist()]
            )
            return batch.filter(mask)

        return ds.map_batches(pick, batch_format="pyarrow")

    return make


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages Parquet file/dir (url, warc_ts, html, text, lang)")
    src.add_argument("--from-documents", metavar="SF_DIR",
                     help="derive pages from SF_DIR/documents.parquet (test corpora)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--preset", choices=["news", "forum", "reference_crawl"])
    ap.add_argument("--profile", help="named profile from config/profiles.yaml "
                                      "(e.g. privacy, news_en)")
    ap.add_argument("--num-shards", type=int, default=None)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    metavar="a.b.c=v", help="config override (repeatable)")
    ap.add_argument("--export-jsonl", action="store_true",
                    help="also export triples as JSONL (knowledge.jsonl "
                         "analog, reference generator.py:44-46)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kgx import config_loader, pipeline

    if args.profile:
        cfg = config_loader.resolve_profile(
            args.profile, overrides=parse_overrides(args.overrides)
        )
        if args.preset:
            raise SystemExit("--profile and --preset are mutually exclusive")
    else:
        cfg = config_loader.resolve_settings(
            preset=args.preset, overrides=parse_overrides(args.overrides)
        )
    num_shards = args.num_shards or config_loader.get("settings", "pipeline.num_shards", 8)

    if args.from_documents:
        make = pipeline.shard_documents_factory(args.from_documents)
    else:
        make = shard_pages_parquet_factory(args.input)

    man = pipeline.run_kg(
        make, args.output, num_shards=num_shards, cfg=cfg, run_id=args.run_id
    )
    if args.export_jsonl:
        import ray.data as rd

        rd.read_parquet(str(Path(args.output) / "triples")).write_json(
            str(Path(args.output) / "triples_jsonl")
        )
    print(json.dumps({"output": str(args.output), "run_id": man.run_id,
                      "shards": len(man.data["shards"]),
                      "counters": man.data["counters"]}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
