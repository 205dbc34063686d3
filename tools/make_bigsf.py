"""Synthesize an sf1-scale dataset from the driver's sf0.1 fixtures for
the SCALING PROBE ONLY (never for correctness: oracles still run on the
driver-generated testdata).

Method: union FACTOR shifted replicas of each scaled table.

- ``documents``: doc_id shifted per replica; ``text`` passed through a
  per-replica Caesar substitution (``F.translate`` over both alphabets,
  replica 0 = identity).  This preserves length, whitespace, word shape
  and token counts exactly — so n_chars stays valid — while changing
  every shingle, so replicas are NOT near-duplicates of each other and
  the corpus-wide near-dup DENSITY stays what it was at sf0.1 (naive
  replication would make every doc a member of a FACTOR-clique and
  quadratically inflate candidate pairs, overstating scaling).
- ``embeddings``: vec_id shifted; a per-replica deterministic sign-flip
  pattern multiplies each dimension by +/-1.  Within-replica cosines are
  EXACTLY preserved (both vectors flip the same dims, dot product is
  unchanged) and norms are unchanged; cross-replica pairs decorrelate.
  ``label`` is kept, so SemDeDup cells grow with the corpus — faithful
  to fixed-k cell assignment, which is the quadratic term the probe is
  there to measure.
- ``lineitem``: l_orderkey shifted (order count scales); part/supp
  foreign keys are kept so dimension joins still resolve with FACTOR x
  fan-in, as in a real scale-up against fixed dims.

All other tables are copied verbatim.  Output is written under
``.localdata/`` (gitignored).

Usage: python tools/make_bigsf.py [factor] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kbrowse_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

LOWER = string.ascii_lowercase
UPPER = string.ascii_uppercase


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _caesar_cols(i: int) -> tuple[str, str]:
    # Replicas < 26: plain Caesar (kept verbatim so the sf1 set is
    # reproducible byte-for-byte).  Beyond 26 shifts would repeat and
    # same-shift replicas become EXACT-duplicate cliques, inflating
    # dup density — so replicas >= 26 use a seeded full-alphabet
    # permutation (26! of them; deterministic Fisher-Yates).
    src = LOWER + UPPER
    if i < 26:
        rot = i % 26
        dst = LOWER[rot:] + LOWER[:rot] + UPPER[rot:] + UPPER[:rot]
        return src, dst
    perm = list(range(26))
    state = i
    for j in range(25, 0, -1):
        state = _splitmix64(state)
        k = state % (j + 1)
        perm[j], perm[k] = perm[k], perm[j]
    lo = "".join(LOWER[p] for p in perm)
    return src, lo + lo.upper()


def _sign_pattern(i: int, dim: int) -> list[float]:
    # Deterministic per-replica +/-1 pattern; replica 0 is identity.
    # Replicas < 10 keep the original Knuth-hash bits (sf1 stays
    # byte-reproducible); the Knuth form collides from i=15 (two
    # replicas with the SAME pattern are exact duplicates of each
    # other), so replicas >= 10 use splitmix64 bits instead.
    if i == 0:
        return [1.0] * dim
    if i < 10:
        return [
            1.0 if ((i * 2654435761 + j * 40503) >> 7) & 1 == 0 else -1.0
            for j in range(dim)
        ]
    return [
        1.0 if _splitmix64(i * 131071 + j) & 1 == 0 else -1.0
        for j in range(dim)
    ]


def scale_documents(df: DataFrame, factor: int, stride: int) -> DataFrame:
    parts = []
    for i in range(factor):
        src, dst = _caesar_cols(i)
        parts.append(
            df.select(
                (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                F.translate("text", src, dst).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scale_embeddings(df: DataFrame, factor: int, stride: int, dim: int) -> DataFrame:
    parts = []
    for i in range(factor):
        signs = F.array(*[F.lit(s) for s in _sign_pattern(i, dim)])
        parts.append(
            df.select(
                (F.col("vec_id") + F.lit(i * stride)).alias("vec_id"),
                F.zip_with(
                    "embedding", signs, lambda x, s: (x * s).cast("float")
                ).alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scale_lineitem(df: DataFrame, factor: int, stride: int) -> DataFrame:
    parts = []
    for i in range(factor):
        parts.append(
            df.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * stride))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make_bigsf")

    for t in TABLES:
        src_path = f"{SRC}/{t}.parquet"
        dst_path = f"{out_dir}/{t}.parquet"
        if t == "documents":
            df = spark.read.parquet(src_path)
            stride = df.agg(F.max("doc_id")).first()[0] + 1
            scaled = scale_documents(df, factor, stride)
        elif t == "embeddings":
            df = spark.read.parquet(src_path)
            stride = df.agg(F.max("vec_id")).first()[0] + 1
            dim = len(df.select("embedding").first()[0])
            scaled = scale_embeddings(df, factor, stride, dim)
        elif t == "lineitem":
            df = spark.read.parquet(src_path)
            stride = df.agg(F.max("l_orderkey")).first()[0] + 1
            scaled = scale_lineitem(df, factor, stride)
        else:
            # Verbatim copy (file or directory parquet).
            if os.path.isdir(src_path):
                if os.path.exists(dst_path):
                    shutil.rmtree(dst_path)
                shutil.copytree(src_path, dst_path)
            else:
                shutil.copyfile(src_path, dst_path)
            print(f"copied {t}")
            continue
        # Single-file parquet like the driver's layout (loaders accept
        # either, but keeping the file-per-table shape avoids surprises).
        tmp = dst_path + ".dir"
        scaled.coalesce(max(1, factor // 2)).write.mode("overwrite").parquet(tmp)
        files = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        if len(files) == 1:
            shutil.move(os.path.join(tmp, files[0]), dst_path)
            shutil.rmtree(tmp)
        else:
            if os.path.exists(dst_path):
                shutil.rmtree(dst_path) if os.path.isdir(dst_path) else os.remove(dst_path)
            shutil.move(tmp, dst_path)
        n = spark.read.parquet(dst_path).count()
        print(f"scaled {t}: {n} rows -> {dst_path}")


if __name__ == "__main__":
    main()
