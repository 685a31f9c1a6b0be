"""Generate PREFIX-CONSISTENT scaled variants of the heavy tables
(documents / embeddings / events) for three-point scaling measurements
(round-10 judge ask #3: replace plan-shape scale arguments with measured
sec-vs-rows slopes).

The driver's /root/testdata is read-only and tops out at sf0.1, so the
scaling corpus is generated here, deterministically (hash-seeded, no
RNG state), with the SAME schemas and the same qualitative structure:
word-salad documents over a small vocabulary with planted exact- and
near-duplicates, unit-norm 64-dim mixture-of-8-clusters embeddings, and
a uniform-rate event stream. Row counts at x1 match sf0.1 (5000 docs /
2000 vectors / 100k events); x3 and x10 are PREFIXES-EXTENSIONS of the
same deterministic sequence (row i is byte-identical at every scale
that contains it), so a slope fitted across scales measures data
volume, not distribution drift. The 7 TPC-H side tables are symlinked
from sf0.1 unchanged (constant-size dimensions; queries keyed on them
are excluded from slope fits and say so in SCALE.md).

Usage: python tools/gen_scaled_data.py [outroot]   # default .scaledata/
Writes outroot/x1, x3, x10, x30 — each a full 10-table sf dir.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import struct
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = {"documents": 5000, "embeddings": 2000, "events": 100_000}
SCALES = {"x1": 1, "x3": 3, "x10": 10, "x30": 30}

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data join shuffle plan stage task codegen broadcast skew salt bucket "
    "prune push limit union"
).split()
LANGS = ["en", "de", "fr", "ja", "zh"]
SOURCES = [f"src{i}" for i in range(20)]
EVENT_TYPES = ["view", "click", "purchase", "error"]


def _h64(*parts) -> int:
    raw = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return struct.unpack("<Q", raw[:8])[0]


def _u(*parts) -> float:
    return _h64(*parts) / 2.0**64


def gen_documents(n: int) -> pa.Table:
    ids, texts, langs, sources = [], [], [], []
    for i in range(n):
        if i >= 100 and _u("dupsel", i) < 0.01:
            # planted exact duplicate of an earlier doc
            j = int(_u("dupof", i) * (i - 1))
            text = texts[j]
        else:
            k = 30 + int(_u("len", i) * 40)
            words = [
                VOCAB[int(_u("w", i, t) * len(VOCAB))] for t in range(k)
            ]
            if i >= 100 and _u("nearsel", i) < 0.02:
                # near-duplicate: an earlier doc with one word swapped
                j = int(_u("nearof", i) * (i - 1))
                words = texts[j].split()
                words[int(_u("nearpos", i) * len(words))] = VOCAB[
                    int(_u("nearw", i) * len(VOCAB))
                ]
            text = " ".join(words)
        ids.append(i)
        texts.append(text)
        langs.append(LANGS[int(_u("lang", i) * len(LANGS))])
        sources.append(SOURCES[int(_u("src", i) * len(SOURCES))])
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n: int) -> pa.Table:
    dim, k = 64, 8
    centers = np.zeros((k, dim))
    for c in range(k):
        v = np.array([_u("cent", c, j) - 0.5 for j in range(dim)])
        centers[c] = v / np.linalg.norm(v)
    vecs = np.zeros((n, dim), dtype=np.float32)
    labels = np.zeros(n, dtype=np.int32)
    for i in range(n):
        c = int(_u("cl", i) * k)
        noise = np.array([_u("nz", i, j) - 0.5 for j in range(dim)])
        v = 0.8 * centers[c] + 0.6 * noise
        vecs[i] = (v / np.linalg.norm(v)).astype(np.float32)
        labels[i] = c
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [vecs[i].tolist() for i in range(n)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )


def gen_events(n: int) -> pa.Table:
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00Z in micros
    ts, users, types, values, props = [], [], [], [], []
    for i in range(n):
        ts.append(base_us + i * 900_000 + int(_u("jit", i) * 900_000))
        users.append(int(_u("user", i) * 1250))
        types.append(EVENT_TYPES[int(_u("et", i) * len(EVENT_TYPES))])
        values.append(round(_u("val", i) * 200.0, 2))
        props.append(json.dumps({"k": int(_u("pk", i) * 100)}))
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )


GENS = {"documents": gen_documents, "embeddings": gen_embeddings, "events": gen_events}
SIDE_TABLES = "region nation customer supplier part orders lineitem".split()


def main() -> None:
    outroot = Path(sys.argv[1] if len(sys.argv) > 1 else
                   Path(__file__).resolve().parents[1] / ".scaledata")
    src = Path("/root/testdata/sf0.1")
    # generate ONCE at the largest scale; smaller scales are row-prefix
    # slices, so row i is identical wherever it exists
    maxmul = max(SCALES.values())
    full = {t: GENS[t](BASE[t] * maxmul) for t in GENS}
    # row groups sized so even x1 yields multiple input splits: a
    # single-row-group file arrives as ONE Spark task however small
    # maxPartitionBytes is, which would serialize per-row-heavy stages
    # and measure the artifact instead of the plan (a 100 TB table has
    # thousands of splits; the scaled fixtures should too)
    row_groups = {"documents": 1250, "embeddings": 500, "events": 25_000}
    for name, mul in SCALES.items():
        d = outroot / name
        d.mkdir(parents=True, exist_ok=True)
        for t, tbl in full.items():
            pq.write_table(
                tbl.slice(0, BASE[t] * mul),
                d / f"{t}.parquet",
                row_group_size=row_groups[t],
            )
        for t in SIDE_TABLES:
            link = d / f"{t}.parquet"
            if not link.exists():
                link.symlink_to(src / f"{t}.parquet")
        print(f"{d}: " + ", ".join(
            f"{t}={BASE[t] * mul}" for t in GENS))


if __name__ == "__main__":
    main()
