"""Resumable extraction runs: bucketed checkpoints with lineage + metrics.

The north rule requires runs "resumable from per-partition checkpoints with
lineage and match-count metrics written alongside each commit".  Design:

* the input splits into B deterministic buckets by ``pmod(hash(conv_id), B)``
  (same function Iceberg's ``bucket(conv_id)`` partition transform uses
  conceptually — co-located with the recommended table layout);
* **stage 0** materializes the input ONCE, partitioned by bucket, under
  ``out/_input/`` (manifest-guarded, so a resume skips it).  Each bucket job
  then reads only its own partition directory via partition pruning — total
  input bytes per run is ~2x the table (one bucketize pass + the sum of the
  pruned per-bucket reads) instead of B full scans.  When the source table is
  *already* physically partitioned by a bucket column (the Iceberg
  ``bucket(conv_id)`` layout the north rule assumes), pass ``bucket_col`` and
  stage 0 is skipped entirely — the filter prunes at the source scan;
* each bucket runs extract -> write ``out/bucket=<b>/`` in ONE pass: row and
  match counts come from ``Observation`` metrics attached to the write job,
  never from a second action over the extraction (round-1 version computed
  extraction twice per bucket — fixed per VERDICT.md item 4);
* a committed bucket writes ``manifest_<b>.json`` (input path, bucket id,
  row/match counts, wall time, engine version) — the lineage record;
* a re-run skips buckets whose manifest exists and is complete.

At cluster scale each bucket is itself many tasks; the bucket loop is
orchestration (a handful of driver-side job submissions), not row work.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .. import __version__
from ..pipeline import DEFAULT_FEATURES, extract


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"manifest_{bucket:04d}.json")


def _read_committed(path: str) -> dict | None:
    if os.path.exists(path):
        with open(path) as fh:
            m = json.load(fh)
        if m.get("status") == "committed":
            return m
    return None


def run_resumable(df: DataFrame, out_dir: str, buckets: int = 16,
                  features: Iterable[str] = DEFAULT_FEATURES,
                  input_desc: str = "", bucket_col: str | None = None,
                  verify_input: bool = True,
                  extract_kwargs: dict | None = None) -> list[dict]:
    """Extract ``df`` in ``buckets`` resumable units; returns manifests.

    ``bucket_col``: name of an existing physical bucket partition column
    (values 0..buckets-1).  When given, stage-0 bucketize is skipped and the
    per-bucket filter prunes directly at the source scan.

    ``extract_kwargs``: extra keyword args forwarded to ``extract`` per
    bucket (gazetteer/postal/taxcat paths, feature params) — the job-param
    plumbing the conversation-scope pass rides on.

    ``verify_input``: on resume over a committed stage-0 bucketize, compare
    ``df.count()`` against the row count recorded in input_manifest.json
    and refuse a silent resume against a CHANGED source (review finding:
    keying only on bucket count + free-text desc reused a stale bucketized
    copy).  count() over a parquet/Iceberg source is metadata-only; pass
    ``verify_input=False`` for expensive computed inputs where the caller
    owns input identity.
    """
    os.makedirs(out_dir, exist_ok=True)
    spark = df.sparkSession

    if bucket_col is None:
        # stage 0: one full scan, written partitioned by bucket
        bucket_col = "_bucket"
        in_dir = os.path.join(out_dir, "_input")
        stage0_path = os.path.join(out_dir, "input_manifest.json")
        stage0 = _read_committed(stage0_path)
        if stage0 is not None and stage0.get("buckets") != buckets:
            # resuming with a different bucket count over a committed
            # bucketize would silently skip (or double-read) buckets
            raise ValueError(
                f"resume bucket-count mismatch: {out_dir} was bucketized "
                f"with buckets={stage0.get('buckets')}, this run asked for "
                f"{buckets} — pass the original count or use a fresh out_dir")
        if stage0 is not None and verify_input and \
                stage0.get("input_rows") is not None:
            n_now = df.count()
            if n_now != stage0["input_rows"]:
                raise ValueError(
                    f"resume input mismatch: {out_dir} was bucketized from "
                    f"{stage0['input_rows']} rows, current source has "
                    f"{n_now} — the source changed; use a fresh out_dir "
                    f"(or verify_input=False to override)")
        if stage0 is None:
            t0 = time.time()
            obs0 = Observation("bucketize")
            (df.withColumn(bucket_col, F.pmod(F.hash("conv_id"), F.lit(buckets)))
               .observe(obs0, F.count(F.lit(1)).alias("rows"))
               .write.mode("overwrite").partitionBy(bucket_col).parquet(in_dir))
            with open(stage0_path, "w") as fh:
                json.dump({"status": "committed", "stage": "bucketize",
                           "buckets": buckets, "input": input_desc,
                           "input_rows": int(obs0.get["rows"] or 0),
                           "engine_version": __version__,
                           "wall_sec": round(time.time() - t0, 3)}, fh)
        src = spark.read.parquet(in_dir)
    else:
        src = df

    manifests = []
    for b in range(buckets):
        mpath = _manifest_path(out_dir, b)
        m = _read_committed(mpath)
        if m is not None:
            if m.get("buckets") != buckets:
                raise ValueError(
                    f"bucket manifest {mpath} was committed under "
                    f"buckets={m.get('buckets')}, this run asked for {buckets}")
            manifests.append(m)
            continue
        t0 = time.time()
        part = src.filter(F.col(bucket_col) == b).drop(bucket_col)
        obs = Observation(f"bucket_{b}")
        result = extract(part, features=features,
                         **(extract_kwargs or {})).observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.size("matches")).alias("matches"))
        result.write.mode("overwrite").parquet(os.path.join(out_dir, f"bucket={b}"))
        metrics = obs.get  # populated by the write job — no second action
        manifest = {
            "status": "committed",
            "bucket": b,
            "buckets": buckets,
            "input": input_desc,
            "engine_version": __version__,
            "features": list(features),
            "rows": int(metrics["rows"] or 0),
            "matches": int(metrics["matches"] or 0),
            "wall_sec": round(time.time() - t0, 3),
        }
        with open(mpath, "w") as fh:
            json.dump(manifest, fh)
        manifests.append(manifest)
    return manifests


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("manifest_") and name.endswith(".json"):
            with open(os.path.join(out_dir, name)) as fh:
                out.append(json.load(fh))
    return out


def read_resumable_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "bucket=*"))
