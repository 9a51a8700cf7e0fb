"""Rewrite Parquet files with different compression / row-group size.

Reference analog: scripts/compress_video.py + batch_compress.py (S9 —
re-encode to shrink storage, batch wrapper with --skip-existing, --dry-run
and a JSON report, batch_compress.py:116-135,137-318).  For a Parquet lake
the equivalent maintenance job is recompression (e.g. snappy -> zstd) and
row-group resizing (bigger groups -> better scans, smaller -> finer
predicate pushdown).

One Ray task per file — the natural unit of parallelism for file
maintenance; skip-existing makes reruns incremental exactly like the
reference's batch compressor.

Usage:
    python scripts/recompress_pages.py SRC_DIR DST_DIR \
        [--codec zstd] [--row-group-size 65536] [--skip-existing] [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def recompress_file(src: str, dst: str, codec: str, row_group_size: int) -> dict:
    import pyarrow.parquet as pq

    tbl = pq.read_table(src)
    Path(dst).parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, dst, compression=codec, row_group_size=row_group_size)
    return {
        "file": Path(src).name,
        "rows": tbl.num_rows,
        "bytes_in": Path(src).stat().st_size,
        "bytes_out": Path(dst).stat().st_size,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src_dir")
    ap.add_argument("dst_dir")
    ap.add_argument("--codec", default="zstd",
                    choices=["zstd", "snappy", "gzip", "lz4", "none"])
    ap.add_argument("--row-group-size", type=int, default=65536)
    ap.add_argument("--skip-existing", action="store_true")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    src_dir, dst_dir = Path(args.src_dir), Path(args.dst_dir)
    files = sorted(src_dir.rglob("*.parquet"))
    plan, skipped = [], []
    for f in files:
        rel = f.relative_to(src_dir)
        dst = dst_dir / rel
        if args.skip_existing and dst.exists():
            skipped.append(str(rel))
        else:
            plan.append((str(f), str(dst)))

    if args.dry_run:
        print(json.dumps({"would_process": [p[0] for p in plan],
                          "skipped": skipped, "dry_run": True}))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    task = ray.remote(recompress_file)
    results = ray.get([
        task.remote(s, d, args.codec, args.row_group_size) for s, d in plan
    ])
    total_in = sum(r["bytes_in"] for r in results)
    total_out = sum(r["bytes_out"] for r in results)
    print(json.dumps({
        "processed": len(results),
        "skipped": skipped,
        "codec": args.codec,
        "row_group_size": args.row_group_size,
        "bytes_in": total_in,
        "bytes_out": total_out,
        "reduction_pct": round(100 * (1 - total_out / total_in), 1) if total_in else 0.0,
        "files": results,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
