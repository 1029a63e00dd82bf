"""Invariants of scripts/make_sf_replica.py (the sf1 sweep generator).

The sf1 oracle sweeps (SURVEY.md round 12) verify the engine at 10×
the driver gate's largest scale; their evidential value rests on the
replica being a faithful scale-up — same schemas, joins closed within
each universe, no planted cross-universe exact duplicates. Pin those
properties at copies=2 over sf0.001 so a tool regression can't
silently weaken a recorded sweep.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
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
)


@pytest.fixture(scope="module")
def replica(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("replica"))
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_sf_replica.py"),
            "--src",
            SRC,
            "--dst",
            dst,
            "--copies",
            "2",
        ],
        check=True,
        capture_output=True,
    )
    return dst


def test_schemas_and_row_counts(replica):
    for t in TABLES:
        src = pq.ParquetFile(os.path.join(SRC, f"{t}.parquet"))
        dst = pq.ParquetFile(os.path.join(replica, f"{t}.parquet"))
        assert src.schema_arrow.types == dst.schema_arrow.types, t
        assert [f.name for f in src.schema_arrow] == [
            f.name for f in dst.schema_arrow
        ], t
        factor = 1 if t in ("region", "nation") else 2
        assert dst.metadata.num_rows == factor * src.metadata.num_rows, t


def test_universe_zero_is_byte_identical(replica):
    """Universe 0 must be the source unchanged — the replica only ADDS
    data, so any sf0.1-verified result stays embedded in the sf1 run."""
    for t in ("documents", "embeddings", "lineitem"):
        src = pd.read_parquet(os.path.join(SRC, f"{t}.parquet"))
        dst = pd.read_parquet(os.path.join(replica, f"{t}.parquet"))
        head = dst.iloc[: len(src)].reset_index(drop=True)
        if t == "embeddings":
            assert all(
                np.array_equal(a, b)
                for a, b in zip(src["embedding"], head["embedding"])
            )
            pd.testing.assert_frame_equal(
                src.drop(columns=["embedding"]),
                head.drop(columns=["embedding"]),
            )
        else:
            pd.testing.assert_frame_equal(src, head)


def test_joins_closed_within_universe(replica):
    """Every foreign key resolves — offsets applied per DOMAIN keep
    orders→customer and lineitem→orders/part/supplier closed."""
    orders = pd.read_parquet(os.path.join(replica, "orders.parquet"))
    cust = pd.read_parquet(os.path.join(replica, "customer.parquet"))
    li = pd.read_parquet(os.path.join(replica, "lineitem.parquet"))
    part = pd.read_parquet(os.path.join(replica, "part.parquet"))
    supp = pd.read_parquet(os.path.join(replica, "supplier.parquet"))
    assert orders["o_custkey"].isin(set(cust["c_custkey"])).all()
    assert li["l_orderkey"].isin(set(orders["o_orderkey"])).all()
    assert li["l_partkey"].isin(set(part["p_partkey"])).all()
    assert li["l_suppkey"].isin(set(supp["s_suppkey"])).all()


def test_no_cross_universe_exact_duplicates(replica):
    """The r11 soak artifact this tool fixes: replicated docs must NOT
    be exact duplicates of their universe-0 originals (pair density
    would grow quadratically in copies), and rolled embeddings must
    differ from the originals while keeping their norms."""
    docs = pd.read_parquet(os.path.join(replica, "documents.parquet"))
    n = len(docs) // 2
    u0, u1 = docs.iloc[:n], docs.iloc[n:]
    assert not u0["text"].isin(set(u1["text"])).any()
    assert (u1["n_chars"] == u1["text"].str.len()).all()
    emb = pd.read_parquet(os.path.join(replica, "embeddings.parquet"))
    m = len(emb) // 2
    a = np.stack(emb["embedding"].iloc[:m].to_numpy())
    b = np.stack(emb["embedding"].iloc[m:].to_numpy())
    assert not np.array_equal(a, b)
    assert np.allclose(
        np.linalg.norm(a, axis=1), np.linalg.norm(b, axis=1)
    )
    # keys unique across the whole replica
    assert emb["vec_id"].is_unique and docs["doc_id"].is_unique
