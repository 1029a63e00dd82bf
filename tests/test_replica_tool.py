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


def test_universes_are_shingle_disjoint_and_jaccard_faithful(replica):
    """The faithfulness contract (review finding over the first r12
    generator): a per-DOC suffix only blocks EXACT duplicates — a
    suffixed copy keeps ~0.97 word-shingle Jaccard with its original,
    so every doc gained C(copies,2) cross-universe near-dup twins and
    planted-pair density stayed quadratic in copies. The per-TOKEN
    bijection must make universes token-DISJOINT (cross-universe
    Jaccard exactly 0 — no banding/verify threshold can pair them)
    while preserving every within-universe pairwise Jaccard exactly
    (a bijection on tokens is a bijection on shingles)."""
    docs = pd.read_parquet(os.path.join(replica, "documents.parquet"))
    n = len(docs) // 2
    u0, u1 = docs.iloc[:n], docs.iloc[n:].reset_index(drop=True)
    tok0 = set().union(*(t.split() for t in u0["text"]))
    tok1 = set().union(*(t.split() for t in u1["text"]))
    assert not (tok0 & tok1), "universes share tokens -> near-dup twins"
    assert (u1["n_chars"] == u1["text"].str.len()).all()

    def shingles(text: str, k: int = 3) -> set[tuple[str, ...]]:
        w = text.split()
        return {tuple(w[i : i + k]) for i in range(len(w) - k + 1)}

    def chargrams(text: str, k: int = 4) -> set[str]:
        return {text[i : i + k] for i in range(len(text) - k + 1)}

    def jac(a: set, b: set) -> float:
        return len(a & b) / len(a | b) if (a | b) else 0.0

    # The character relabeling is a bijection on chars, hence on char
    # k-grams and on tokens/word shingles: within-universe pairwise
    # Jaccard must be EXACTLY the source's at BOTH granularities, and
    # the disjoint per-universe alphabets make every cross-universe
    # similarity EXACTLY zero — including a doc vs its own copy (the
    # property every suffix-tag design measurably failed on the char
    # side: the uniform tag pushed unrelated docs above 0.7 — qx20
    # ~9k -> 22.7M pairs at sf1; ~UUHH inflated aggregate structure
    # 8x — 21,796 -> 1,701,977 candidates at 10x; a partitioned
    # 62^4-space hash suffix still amplified common-token shared-gram
    # mass — 919,620 at 10x, 8,375,287 at 20x).
    import itertools

    sample = range(0, min(len(u0), 40))
    for i, j in itertools.combinations(sample, 2):
        j0 = jac(shingles(u0["text"].iloc[i]), shingles(u0["text"].iloc[j]))
        j1 = jac(shingles(u1["text"].iloc[i]), shingles(u1["text"].iloc[j]))
        assert j0 == j1, (i, j, j0, j1)
        c0 = jac(
            chargrams(u0["text"].iloc[i]), chargrams(u0["text"].iloc[j])
        )
        c1 = jac(
            chargrams(u1["text"].iloc[i]), chargrams(u1["text"].iloc[j])
        )
        assert c0 == c1, (i, j, c0, c1)
        # cross-universe UNRELATED docs: exactly zero shared grams
        cx = jac(
            chargrams(u0["text"].iloc[i]), chargrams(u1["text"].iloc[j])
        )
        assert cx == 0.0, (i, j, cx)
    # a doc and its own cross-universe copy: exactly zero at both
    # granularities — no planted twins at ANY threshold
    for i in sample:
        assert (
            jac(chargrams(u0["text"].iloc[i]), chargrams(u1["text"].iloc[i]))
            == 0.0
        ), i
        assert (
            jac(shingles(u0["text"].iloc[i]), shingles(u1["text"].iloc[i]))
            == 0.0
        ), i

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


def test_copies_beyond_roll_period_refused(tmp_path):
    """np.roll is cyclic with period = embedding dim: universe `dim`
    would be byte-identical to universe 0 (exact planted twins — the
    quadratic-density artifact again). The generator must refuse
    rather than silently produce it — and refuse UP FRONT, before any
    table is written, so a refused run can't leave a partial replica
    directory for a later sweep to consume. If the fixture dim were
    >= 100 the pad guard fires first with its own message, so accept
    either refusal text (the exit + empty-dst contract is the point)."""
    emb = pd.read_parquet(os.path.join(SRC, "embeddings.parquet"))
    dim = len(emb["embedding"].iloc[0])
    dst = str(tmp_path / "refused")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_sf_replica.py"),
            "--src",
            SRC,
            "--dst",
            dst,
            "--copies",
            str(dim + 1),
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode != 0
    assert "cyclic" in proc.stderr or "pad" in proc.stderr
    # up-front validation: the destination must not even exist
    assert not os.path.exists(dst)


def test_empty_embeddings_fixture_refused_clearly(tmp_path):
    """An empty embeddings fixture must refuse with the explicit
    message, not a bare IndexError from the dim lookup — the up-front
    validation contract includes failing legibly (ADVICE r13)."""
    src = tmp_path / "src_empty"
    src.mkdir()
    for t in TABLES:
        if t == "embeddings":
            pd.read_parquet(os.path.join(SRC, "embeddings.parquet")).iloc[
                :0
            ].to_parquet(src / "embeddings.parquet", index=False)
        else:
            os.symlink(
                os.path.join(SRC, f"{t}.parquet"), src / f"{t}.parquet"
            )
    dst = str(tmp_path / "refused_empty")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_sf_replica.py"),
            "--src",
            str(src),
            "--dst",
            dst,
            "--copies",
            "2",
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode != 0
    assert "empty" in proc.stderr
    assert "IndexError" not in proc.stderr
    assert not os.path.exists(dst)


def test_copies_beyond_pad_width_refused_before_writing(tmp_path):
    """The per-universe alphabet pad reserves 100 disjoint 0x80-wide
    codepoint blocks; more than 100 copies must refuse up front with
    nothing written."""
    dst = str(tmp_path / "refused_pad")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_sf_replica.py"),
            "--src",
            SRC,
            "--dst",
            dst,
            "--copies",
            "101",
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode != 0
    assert "pad" in proc.stderr
    assert not os.path.exists(dst)
