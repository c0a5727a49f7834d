"""Deduplication operators over a document table — the large-scale
training-data extensions (exact, MinHash+LSH, SimHash, n-gram Jaccard).

All follow the same Ray-Data shape: vectorized per-batch signature
computation (stateless map_batches), one groupby shuffle on the
signature/bucket key, candidate verification inside the group, and —
for near-dup families — connected components to pick one survivor per
duplicate class. Only (id, signature) columns travel through shuffles.
"""

from __future__ import annotations

import zlib
from collections import defaultdict
from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..cluster.union_find import connected_components
from ..joins.hashjoin import hash_join

_MERSENNE = (1 << 61) - 1


# ------------------------------------------------------------------- exact


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Keep one row per distinct text (the min id) — hash-partition by a
    content hash, resolve collisions on the real value inside the group."""

    def add_hash(t: pa.Table) -> pa.Table:
        h = np.fromiter(
            (zlib.crc32((v or "").encode()) for v in t.column(text_col).to_pylist()),
            np.int64,
            count=t.num_rows,
        )
        return t.append_column("__dd_hash", pa.array(h))

    def first_per_text(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        best: dict[str, int] = {}
        for i, (d, v) in enumerate(zip(ids, texts)):
            cur = best.get(v)
            if cur is None or d < ids[cur]:
                best[v] = i
        keep = sorted(best.values())
        return t.take(keep).drop_columns(["__dd_hash"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__dd_hash")
        .map_groups(first_per_text, batch_format="pyarrow")
    )


# ----------------------------------------------------------------- shingles


_FNV = np.uint64(1099511628211)


def _shingle_weights(k: int) -> np.ndarray:
    w = np.empty(k, dtype=np.uint64)
    acc = 1
    for i in range(k):
        w[i] = acc
        acc = (acc * 1099511628211) % (1 << 64)  # mod 2^64, deterministic
    return w


def char_shingles(text: str, k: int) -> np.ndarray:
    """Sorted distinct 64-bit polynomial hashes of the k-byte shingles of
    ``text`` — fully vectorized (sliding windows x weight dot, wrapping
    uint64 arithmetic), so long documents shingle in microseconds."""
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(b) < k:
        if not len(b):
            return np.empty(0, dtype=np.uint64)
        w = _shingle_weights(len(b))
        return np.asarray([int((b.astype(np.uint64) * w).sum())], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (win * _shingle_weights(k)[None, :]).sum(axis=1)
    return np.unique(h)


def jaccard_sets(a: np.ndarray, b: np.ndarray) -> float:
    if not len(a) and not len(b):
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*h + b) mod p — vectorized (perm x shingle)."""
    if not len(shingles):
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    prod = (shingles[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


def _pairs_from_buckets(
    bucketed: rd.Dataset, id_col: str, max_bucket: int = 4096, num_partitions: int = 64
) -> rd.Dataset:
    """(a, b) candidate pairs per bucket, a < b; deduped across buckets by
    a later groupby.

    Implementation note: bucket keys are high-cardinality (mostly
    singleton), and Ray's per-group ``map_groups`` UDF dispatch costs
    more than the work — so buckets are hash-partitioned and each
    partition is processed in ONE pandas call that skips singleton
    buckets via value_counts and emits pairs with vectorized
    triu indices. Buckets larger than ``max_bucket`` are skipped — the
    standard LSH stop-word cap (near-zero signal per pair, quadratic
    cost; documented recall caveat)."""
    import pandas as pd

    def add_part(t: pa.Table) -> pa.Table:
        col = t["__bucket"].combine_chunks() if isinstance(t["__bucket"], pa.ChunkedArray) else t["__bucket"]
        h = pd.util.hash_array(np.asarray(col.to_numpy(zero_copy_only=False)), categorize=False)
        return t.append_column("__bp", pa.array((h % num_partitions).astype(np.int64)))

    def pairs_part(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["__bucket"].value_counts()
        keep = vc[(vc >= 2) & (vc <= max_bucket)].index
        if not len(keep):
            return pd.DataFrame({"a": pd.Series([], dtype=df[id_col].dtype), "b": pd.Series([], dtype=df[id_col].dtype)})
        sub = df[df["__bucket"].isin(keep)]
        out_a, out_b = [], []
        for _, g in sub.groupby("__bucket", sort=False):
            ids = np.unique(g[id_col].to_numpy())
            if len(ids) < 2:
                continue
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=df[id_col].dtype), "b": pd.Series([], dtype=df[id_col].dtype)})
        return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})

    cand = (
        bucketed.map_batches(add_part, batch_format="pyarrow")
        .groupby("__bp")
        .map_groups(pairs_part, batch_format="pandas")
    )
    # a pair sharing multiple buckets appears multiple times -> distinct
    return cand.groupby(["a", "b"]).count().map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    )


def _attach_pair_texts(
    cand: rd.Dataset, ds: rd.Dataset, text_col: str, id_col: str, num_partitions: int
) -> rd.Dataset:
    """Join both sides' text onto (a, b) candidate pairs -> columns
    (a, b, __a_text, __t_text)."""
    texts = ds.map_batches(
        lambda t: pa.table({"__t_id": t[id_col], "__t_text": t[text_col]}),
        batch_format="pyarrow",
    )
    j = hash_join(cand, texts, "a", "__t_id", how="inner", num_partitions=num_partitions)
    j = j.map_batches(
        lambda t: t.rename_columns(
            [{"__t_text": "__a_text"}.get(c, c) for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    return hash_join(j, texts, "b", "__t_id", how="inner", num_partitions=num_partitions)


def _verify_pairs_jaccard(
    cand: rd.Dataset,
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    shingle_k: int,
    threshold: float,
    num_partitions: int,
) -> rd.Dataset:
    """Join text back onto candidate pairs and keep exact set-jaccard >= t."""
    j = _attach_pair_texts(cand, ds, text_col, id_col, num_partitions)

    def verify(t: pa.Table) -> pa.Table:
        keep = []
        sims = []
        at = t.column("__a_text").to_pylist()
        bt = t.column("__t_text").to_pylist()
        cache: dict[str, np.ndarray] = {}

        def sh(s):
            r = cache.get(s)
            if r is None:
                r = char_shingles(s or "", shingle_k)
                cache[s] = r
            return r

        for i in range(t.num_rows):
            sim = jaccard_sets(sh(at[i]), sh(bt[i]))
            if sim >= threshold:
                keep.append(i)
                sims.append(sim)
        out = t.take(keep).select(["a", "b"])
        return out.append_column("jaccard", pa.array(sims, pa.float64()))

    return j.map_batches(verify, batch_format="pyarrow")


def minhash_candidate_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 13,
) -> rd.Dataset:
    """Distinct (a, b) candidate pairs from banded MinHash buckets —
    the scalable candidate generator reused by near-dup dedup AND the
    linkage pipeline's minhash blocking."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm, seed)

    def buckets(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_bucket, out_id = [], []
        for d, txt in zip(ids, texts):
            if txt is None:
                continue
            sig = minhash_signature(char_shingles(txt, shingle_k), a, b)
            for bi in range(bands):
                band = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                bh = zlib.crc32(band.tobytes())
                out_bucket.append(f"{bi}:{bh}")
                out_id.append(d)
        return pa.table(
            {
                "__bucket": pa.array(out_bucket, pa.string()),
                id_col: pa.array(out_id, type=t.column(id_col).type),
            }
        )

    bucketed = ds.map_batches(buckets, batch_format="pyarrow")
    return _pairs_from_buckets(bucketed, id_col)


def minhash_lsh_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 13,
    num_partitions: int = 32,
    id_type=None,
) -> rd.Dataset:
    """Near-duplicate classes via MinHash+LSH: shingle -> minhash ->
    banded buckets -> candidate pairs -> exact-jaccard verify ->
    connected components. Returns (doc_id, dup_group) for every doc;
    dup_group = min doc_id of its duplicate class."""
    edges = lsh_fused_edges(
        ds,
        text_col,
        id_col,
        jaccard_score_fn(shingle_k, threshold),
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        seed=seed,
        num_partitions=num_partitions,
    )
    return _dup_groups(ds, edges, id_col, num_partitions, id_type)


def _dup_groups(ds, edges, id_col, num_partitions, id_type=None) -> rd.Dataset:
    labels = connected_components(edges, "a", "b", num_partitions=num_partitions)
    labels_r = labels.map_batches(
        lambda t: pa.table({"__cc_node": t["node"], "__cc_lbl": t["cluster"]}),
        batch_format="pyarrow",
    )
    if id_type is None:
        sch = ds.schema()
        id_type = dict(zip(sch.names, sch.types))[id_col]
    idt = id_type
    ids = ds.map_batches(lambda t: t.select([id_col]), batch_format="pyarrow")
    joined = hash_join(
        ids,
        labels_r,
        id_col,
        "__cc_node",
        how="left_outer",
        num_partitions=num_partitions,
        left_schema=pa.schema([(id_col, idt)]),
        right_schema=pa.schema([("__cc_node", idt), ("__cc_lbl", idt)]),
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                id_col: t[id_col],
                "dup_group": pa.compute.coalesce(t["__cc_lbl"], t[id_col]),
            }
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------------ simhash


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (crc-based feature hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in (text or "").split():
        h = np.uint64(zlib.crc32(tok.encode())) | (
            np.uint64(zlib.crc32(tok[::-1].encode())) << np.uint64(32)
        )
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == np.uint64(1), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    num_partitions: int = 32,
    id_type=None,
) -> rd.Dataset:
    """Near-dup classes under SimHash hamming distance <= k: the 64-bit
    signature is split into k+1 blocks (pigeonhole: any pair within k
    bits shares at least one exact block); block buckets generate
    candidates, popcount verifies."""
    blocks = max_hamming + 1
    width = 64 // blocks

    def emit(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_bucket, out_id, out_sig = [], [], []
        for d, txt in zip(ids, texts):
            sig = simhash64(txt)
            for bi in range(blocks):
                lo = bi * width
                hi = 64 if bi == blocks - 1 else lo + width
                part = (sig >> lo) & ((1 << (hi - lo)) - 1)
                out_bucket.append(f"{bi}:{part}")
                out_id.append(d)
                out_sig.append(sig)
        return pa.table(
            {
                "__bucket": pa.array(out_bucket, pa.string()),
                id_col: pa.array(out_id, type=t.column(id_col).type),
                "__sig": pa.array(np.array(out_sig, dtype=np.uint64)),
            }
        )

    def pairs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        sigs = t.column("__sig").to_pylist()
        sig_of = dict(zip(ids, sigs))
        uniq = sorted(sig_of)
        out_a, out_b = [], []
        for x, y in combinations(uniq, 2):
            if bin(sig_of[x] ^ sig_of[y]).count("1") <= max_hamming:
                out_a.append(x)
                out_b.append(y)
        idt = t.column(id_col).type
        return pa.table({"a": pa.array(out_a, idt), "b": pa.array(out_b, idt)})

    bucketed = ds.map_batches(emit, batch_format="pyarrow")
    cand = bucketed.groupby("__bucket").map_groups(pairs, batch_format="pyarrow")
    edges = cand.groupby(["a", "b"]).count().map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    )
    return _dup_groups(ds, edges, id_col, num_partitions, id_type)


# ------------------------------------------------------- n-gram jaccard dup


def ngram_jaccard_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_k: int = 5,
    threshold: float = 0.8,
    max_block_emit: int = 24,
    num_partitions: int = 32,
    id_type=None,
) -> rd.Dataset:
    """Exact n-gram-Jaccard duplicate classes WITHOUT minhash
    approximation, for thresholds > 0.5: block on the ``m`` smallest
    shingle hashes (prefix filtering — two sets with jaccard >= t must
    share one of each other's smallest ceil((1-t)|S|)+1 hashes); verify
    exact jaccard in-group."""

    def emit(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_bucket, out_id = [], []
        for d, txt in zip(ids, texts):
            sh = char_shingles(txt or "", shingle_k)
            if not len(sh):
                continue
            prefix = int(np.ceil((1 - threshold) * len(sh))) + 1
            prefix = min(prefix, max_block_emit, len(sh))
            for h in sh[:prefix]:  # shingles sorted by hash
                out_bucket.append(str(h))
                out_id.append(d)
        return pa.table(
            {
                "__bucket": pa.array(out_bucket, pa.string()),
                id_col: pa.array(out_id, type=t.column(id_col).type),
            }
        )

    bucketed = ds.map_batches(emit, batch_format="pyarrow")
    cand = _pairs_from_buckets(bucketed, id_col)
    verified = _verify_pairs_jaccard(
        cand, ds, text_col, id_col, shingle_k, threshold, num_partitions
    )
    return _dup_groups(ds, verified, id_col, num_partitions, id_type)


def lsh_fused_edges(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    score_fn,
    *,
    num_perm: int = 64,
    bands: int = 32,
    shingle_k: int = 2,
    seed: int = 13,
    num_partitions: int = 64,
    max_bucket: int = 4096,
) -> rd.Dataset:
    """Fused LSH candidate generation + verification -> (a, b, score).

    Buckets carry the text value and the row's full band-hash vector, so
    each bucket-hash partition (i) builds candidate pairs with vectorized
    triu indices, (ii) enforces the exactly-once-across-bands rule (a
    pair is verified only in the first band whose signatures agree — no
    downstream dedup shuffle), and (iii) verifies candidates in ONE
    ``score_fn(list_a, list_b) -> (keep_mask, scores)`` call. Rows with
    null text are skipped; oversized buckets are dropped (LSH stop-word
    cap). Emits each surviving pair exactly once with a < b.
    """
    import pandas as pd

    rows_per_band = num_perm // bands
    assert rows_per_band * bands == num_perm
    ma, mb = _minhash_params(num_perm, seed)

    def buckets(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        kvs = t.column(text_col).to_pylist()
        out_bucket, out_band, out_id, out_key, out_bh = [], [], [], [], []
        for r, kv in zip(ids, kvs):
            if kv is None:
                continue
            sig = minhash_signature(char_shingles(kv, shingle_k), ma, mb)
            bhs = [
                zlib.crc32(sig[bi * rows_per_band : (bi + 1) * rows_per_band].tobytes())
                for bi in range(bands)
            ]
            for bi, bh in enumerate(bhs):
                out_bucket.append(f"{bi}:{bh}")
                out_band.append(bi)
                out_id.append(r)
                out_key.append(kv)
                out_bh.append(bhs)
        return pa.table(
            {
                "__bucket": pa.array(out_bucket, pa.string()),
                "__band": pa.array(out_band, pa.int32()),
                id_col: pa.array(out_id, type=t.column(id_col).type),
                text_col: pa.array(out_key, pa.string()),
                "__bh": pa.array(
                    np.asarray(out_bh, dtype=np.int64).reshape(-1, bands).tolist()
                    if out_bh
                    else [],
                    pa.list_(pa.int64(), bands),
                ),
            }
        )

    def add_bp(t: pa.Table) -> pa.Table:
        col = t["__bucket"].combine_chunks() if isinstance(t["__bucket"], pa.ChunkedArray) else t["__bucket"]
        h = pd.util.hash_array(np.asarray(col.to_numpy(zero_copy_only=False)), categorize=False)
        return t.append_column("__bp", pa.array((h % num_partitions).astype(np.int64)))

    def score_part(df: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype=object),
                "b": pd.Series([], dtype=object),
                "score": pd.Series([], dtype=np.float64),
            }
        )
        vc = df["__bucket"].value_counts()
        hot = vc[(vc >= 2) & (vc <= max_bucket)].index
        if not len(hot):
            return empty
        sub = df[df["__bucket"].isin(hot)].reset_index(drop=True)
        ids = sub[id_col].to_numpy()
        kvs = sub[text_col].to_numpy()
        BH = np.asarray(sub["__bh"].tolist(), dtype=np.int64)
        bands_arr = sub["__band"].to_numpy()
        groups = sub.groupby("__bucket", sort=False).indices
        pa_idx, pb_idx = [], []
        for pos in groups.values():
            band = int(bands_arr[pos[0]])
            _, first = np.unique(ids[pos], return_index=True)
            pos = pos[np.sort(first)]
            if len(pos) < 2:
                continue
            ii, jj = np.triu_indices(len(pos), k=1)
            ai = pos[ii]
            bi = pos[jj]
            if band > 0:
                seen = (BH[ai, :band] == BH[bi, :band]).any(axis=1)
                ai = ai[~seen]
                bi = bi[~seen]
            pa_idx.append(ai)
            pb_idx.append(bi)
        if not pa_idx:
            return empty
        ai = np.concatenate(pa_idx)
        bi = np.concatenate(pb_idx)
        keep, scores = score_fn(list(kvs[ai]), list(kvs[bi]))
        ra = ids[ai[keep]]
        rb = ids[bi[keep]]
        src = np.where(ra < rb, ra, rb)
        dst = np.where(ra < rb, rb, ra)
        return pd.DataFrame({"a": src, "b": dst, "score": scores})

    return (
        ds.map_batches(buckets, batch_format="pyarrow")
        .map_batches(add_bp, batch_format="pyarrow")
        .groupby("__bp")
        .map_groups(score_part, batch_format="pandas")
    )


def jaccard_score_fn(shingle_k: int, threshold: float):
    """score_fn for lsh_fused_edges: exact set-jaccard >= threshold."""

    def fn(a_list, b_list):
        cache: dict[str, np.ndarray] = {}

        def sh(s):
            r = cache.get(s)
            if r is None:
                r = char_shingles(s, shingle_k)
                cache[s] = r
            return r

        sims = np.fromiter(
            (jaccard_sets(sh(x), sh(y)) for x, y in zip(a_list, b_list)),
            np.float64,
            count=len(a_list),
        )
        keep = sims >= threshold
        return keep, sims[keep]

    return fn
