"""Replicate a fixture scale factor N× into key-offset universes.

The per-round oracle gate tops out at sf0.1 (`TESTDATA.md`); the sf1
verification sweeps (SURVEY.md "Round-12 sf1 ORACLE sweep") need a 10×
corpus that preserves every schema and referential relationship while
NOT inflating planted near-duplicate density quadratically. Strategy,
matching the sweep described in SURVEY.md:

- `region`/`nation` (dims) are copied once — universes share them,
  exactly as 1000 executors share broadcast dims at 100 TB.
- Every fact/extension table is concatenated N times with each key
  domain offset by ``universe * stride`` where the stride is computed
  once per key DOMAIN (customer keys offset identically in `customer`
  and `orders`, order keys in `orders` and `lineitem`, …) so joins
  stay closed within a universe.
- `documents.text` is re-tokenized per universe: every non-whitespace
  token gets `~UUHH` appended, where UU is the zero-padded universe
  index and HH two hex chars of md5(token) (universe 0 stays
  byte-identical to the source). This per-token BIJECTION (fixed
  suffix length, so equal tagged tokens imply equal originals) makes
  the token/word-shingle sets of different universes DISJOINT — the
  UU digits differ, so cross-universe word-shingle Jaccard is exactly
  0 and no dedup pass (MinHash banding, SimHash, containment,
  passage, ExactSubstr, CC chaining) can pair copies across universes
  — while within a universe every pairwise word-shingle Jaccard is
  IDENTICAL to the source's (a bijection on tokens is a bijection on
  shingles). Pair density is therefore exactly linear in copies.
  Two earlier designs failed review and are worth recording: a
  per-DOC suffix only blocks EXACT duplicates (a suffixed copy keeps
  ~0.97 shingle Jaccard with its original — every doc gained
  C(copies,2) cross-universe near-dup twins, quadratic pair
  structure), and a UNIFORM per-token tag fixed the word-shingle side
  but injected the same char-grams into every token of a universe,
  inflating CHAR-gram Jaccard between unrelated short docs above
  near-dup thresholds (qx20 blew up from ~9k to 22.7M pairs at sf1).
  The HH component ties the suffix to the token, so shared char-grams
  track shared tokens and the char-gram pair structure scales too.
  `n_chars` is recomputed to stay consistent with the tagged text.
- `embeddings.embedding` is ROLLED by the universe index (cyclic shift
  of the float vector) — cheap, deterministic, norm-preserving, and it
  decorrelates cosine structure across universes. Rolling is cyclic
  with period = embedding dim, so ``--copies`` above the dim would
  silently reintroduce byte-identical vectors; the generator refuses.

Both engines (Spark and the DuckDB oracle) read the same written
parquet, so none of these choices can affect parity — they only shape
the data distribution the sweep runs on.

Usage:
    python scripts/make_sf_replica.py --src /root/testdata/sf0.1 \
        --dst /tmp/sf1 --copies 10
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np
import pandas as pd

_TOKEN = re.compile(r"\S+")

# key domains: domain -> [(table, column), ...]; stride computed per
# domain over the union of its columns, so every referencing table
# offsets the same key identically.
KEY_DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}

SHARED_DIMS = ("region", "nation")
REPLICATED = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _strides(tables: dict[str, pd.DataFrame]) -> dict[str, int]:
    out = {}
    for domain, cols in KEY_DOMAINS.items():
        hi = max(int(tables[t][c].max()) for t, c in cols)
        # next power of ten above the max key: offsets stay readable
        # in failure output and can never collide across universes.
        stride = 10 ** len(str(hi))
        out[domain] = stride
    return out


def _offset_universe(
    name: str, pdf: pd.DataFrame, u: int, strides: dict[str, int]
) -> pd.DataFrame:
    out = pdf.copy(deep=False)
    for domain, cols in KEY_DOMAINS.items():
        for t, c in cols:
            if t == name:
                out[c] = out[c] + u * strides[domain]
    if u > 0 and name == "documents":
        import hashlib

        hh: dict[str, str] = {}  # md5 prefix per DISTINCT token

        def _tag(m: re.Match) -> str:
            tok = m.group(0)
            h = hh.get(tok)
            if h is None:
                h = hashlib.md5(tok.encode()).hexdigest()[:2]
                hh[tok] = h
            return f"{tok}~{u:02d}{h}"

        out["text"] = out["text"].map(lambda t: _TOKEN.sub(_tag, t))
        out["n_chars"] = out["text"].str.len().astype("int64")
    if u > 0 and name == "embeddings":
        mat = np.stack(out["embedding"].to_numpy())
        # keep float32: a float64 roundtrip would silently widen the
        # parquet schema to list<double> and change stored values
        rolled = np.roll(mat, u, axis=1).astype(np.float32)
        out["embedding"] = list(rolled)
    return out


def _validate_pad(copies: int) -> None:
    """The one guard that needs no table data — checked right after
    argparse so a bad --copies refuses before paying the full source
    parquet load (the data-dependent embedding-dim check stays in
    :func:`_validate_copies`)."""
    if copies > 100:
        raise SystemExit(
            "--copies > 100: the ~UUHH tag pads the universe "
            "index to two digits; widen the pad to go further"
        )


def _validate_copies(copies: int, tables: dict[str, pd.DataFrame]) -> None:
    """Refuse invalid --copies BEFORE anything is written: a mid-run
    refusal used to leave a partial replica directory (customer..events
    already written) that a later sweep could consume as a valid scale
    dir. All guards run up front; the destination is not even created
    on refusal."""
    if tables["embeddings"].empty:
        raise SystemExit(
            "embeddings fixture is empty: cannot determine the "
            "embedding dim the cyclic-roll guard needs"
        )
    dim = len(tables["embeddings"]["embedding"].iloc[0])
    if copies - 1 >= dim:
        raise SystemExit(
            f"--copies {copies} >= embedding dim {dim}: "
            "np.roll is cyclic, universe dim would duplicate "
            "universe 0's vectors exactly"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    _validate_pad(args.copies)
    tables = {
        t: pd.read_parquet(os.path.join(args.src, f"{t}.parquet"))
        for t in SHARED_DIMS + REPLICATED
    }
    _validate_copies(args.copies, tables)
    os.makedirs(args.dst, exist_ok=True)
    strides = _strides(tables)
    for t in SHARED_DIMS:
        tables[t].to_parquet(
            os.path.join(args.dst, f"{t}.parquet"), index=False
        )
        print(f"{t}: shared dim, {len(tables[t])} rows")
    for t in REPLICATED:
        parts = [
            _offset_universe(t, tables[t], u, strides)
            for u in range(args.copies)
        ]
        full = pd.concat(parts, ignore_index=True)
        full.to_parquet(os.path.join(args.dst, f"{t}.parquet"), index=False)
        print(f"{t}: {len(tables[t])} -> {len(full)} rows")
    print("strides:", strides)


if __name__ == "__main__":
    main()
