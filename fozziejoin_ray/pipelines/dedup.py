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

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_EMPTY_U64 = np.empty(0, np.uint64)

from ..cluster.union_find import connected_components
from ..joins.hashjoin import hash_join

_MERSENNE = (1 << 61) - 1


# ------------------------------------------------------------------- exact


def exact_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> rd.Dataset:
    """Keep one row per distinct text (the min id) — hash-partition by a
    vectorized content hash (mod ``num_partitions``, NOT one group per
    distinct value: per-group UDF dispatch costs more than the work) and
    resolve each partition with a single pandas groupby-idxmin."""
    import pandas as pd

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        filled = pc.fill_null(col, "")  # nulls co-partition with ""; value groupby separates them
        h = pd.util.hash_array(np.asarray(filled.to_numpy(zero_copy_only=False)), categorize=False)
        return t.append_column("__dp", pa.array((h % num_partitions).astype(np.int64)))

    def first_per_text(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.drop(columns=["__dp"])
        idx = df.groupby(text_col, sort=False, dropna=False)[id_col].idxmin()
        return df.loc[np.sort(idx.to_numpy())].drop(columns=["__dp"])

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__dp")
        .map_groups(first_per_text, batch_format="pandas")
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


class DocShingleIndex:
    """Compact per-doc shingle-set index for exact-jaccard verification,
    built ONCE (usually on the driver, then ``ray.put``) and shared
    zero-copy by every task/actor that scores candidate pairs.

    Layout: one flat uint64 array of all docs' sorted distinct shingles
    + int64 offsets (plasma zero-copy), plus a bitset matrix over the
    df>=2 vocabulary — shingles that occur in a single document can
    never contribute to an intersection, so dropping them from the
    bitmap is EXACT and collapses the vocabulary of natural corpora by
    orders of magnitude. ``jaccard_idx`` scores pair slabs with
    ``popcount(A & B)`` when the bitset fits (`_BITSET_VOCAB_CAP`,
    1 GiB matrix cap), else per-pair sorted intersection on the flat
    array. Results are bit-identical to :func:`jaccard_sets`."""

    def __init__(self, ids: list, texts: list, shingle_k: int):
        self.ids = list(ids)
        self._idx: dict | None = None
        shs = [char_shingles(t or "", shingle_k) for t in texts]
        n = len(shs)
        self.lens = np.fromiter((len(s) for s in shs), np.int64, count=n)
        self.offsets = np.zeros(n + 1, np.int64)
        np.cumsum(self.lens, out=self.offsets[1:])
        self.flat = (
            np.concatenate([s for s in shs if len(s)])
            if self.offsets[-1]
            else np.empty(0, np.uint64)
        )
        u, c = np.unique(self.flat, return_counts=True)
        vocab = u[c >= 2]  # doc shingle sets are distinct -> counts == df
        self._vocab_n = len(vocab)
        self.M = None
        nwords = max(1, (len(vocab) + 63) >> 6)
        if len(vocab) <= _BITSET_VOCAB_CAP and n * nwords * 8 <= 1 << 30:
            M = np.zeros((n, nwords), dtype=np.uint64)
            rows = np.repeat(np.arange(n, dtype=np.int64), self.lens)
            pos = np.searchsorted(vocab, self.flat)
            np.minimum(pos, len(vocab) - 1 if len(vocab) else 0, out=pos)
            hit = vocab[pos] == self.flat if len(vocab) else np.zeros(len(pos), bool)
            col = pos[hit].astype(np.uint64)
            np.bitwise_or.at(
                M,
                (rows[hit], (col >> np.uint64(6)).astype(np.int64)),
                np.uint64(1) << (col & np.uint64(63)),
            )
            self.M = M

    def lookup(self, id_values) -> np.ndarray:
        """Map external id values -> row indices (-1 when absent)."""
        if self._idx is None:
            self._idx = {d: i for i, d in enumerate(self.ids)}
        get = self._idx.get
        return np.fromiter((get(x, -1) for x in id_values), np.int64, count=len(id_values))

    @staticmethod
    def _popcount_pairs(
        M: np.ndarray, ai: np.ndarray, bi: np.ndarray, la: np.ndarray, lb: np.ndarray
    ) -> np.ndarray:
        lut = _popcount16_lut()
        n = len(ai)
        sims = np.empty(n, np.float64)
        for s0 in range(0, n, _PAIR_SLAB):
            sl = slice(s0, min(s0 + _PAIR_SLAB, n))
            X = M[ai[sl]] & M[bi[sl]]
            inter = lut[X.view(np.uint16)].sum(axis=1, dtype=np.int64)
            union = la[sl] + lb[sl] - inter
            with np.errstate(divide="ignore", invalid="ignore"):
                sims[sl] = np.where(union > 0, inter / union, 1.0)
        return sims

    def jaccard_idx(self, ai: np.ndarray, bi: np.ndarray) -> np.ndarray:
        """Exact set-jaccard for row-index pairs, vectorized.

        When the corpus-wide bitset was too wide to build, a LOCAL one is
        built over just the docs this call touches (a bucket partition /
        verify batch references a small doc subset, whose df>=2
        vocabulary is far narrower than the corpus's) — restricting to
        locally-shared shingles is exact for intersections among those
        docs. Per-pair sorted intersection remains the last resort."""
        n = len(ai)
        if not n:
            return np.empty(0, np.float64)
        if self.M is not None:
            return self._popcount_pairs(self.M, ai, bi, self.lens[ai], self.lens[bi])
        docs = np.unique(np.concatenate([ai, bi]))
        if len(docs) == len(self.lens) and self._vocab_n > _BITSET_VOCAB_CAP:
            # local == global vocabulary, already known too wide
            return self._jaccard_loop(ai, bi)
        L = self.lens[docs]
        starts = self.offsets[docs]
        cum = np.cumsum(L)
        total = int(cum[-1]) if len(L) else 0
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(cum - L, L)
            + np.repeat(starts, L)
        )
        flat_local = self.flat[pos]
        u, c = np.unique(flat_local, return_counts=True)
        vocab = u[c >= 2]
        nwords = max(1, (len(vocab) + 63) >> 6)
        if len(vocab) <= _BITSET_VOCAB_CAP and len(docs) * nwords * 8 <= 1 << 30:
            M = np.zeros((len(docs), nwords), dtype=np.uint64)
            rows = np.repeat(np.arange(len(docs), dtype=np.int64), L)
            p = np.searchsorted(vocab, flat_local)
            np.minimum(p, len(vocab) - 1 if len(vocab) else 0, out=p)
            hit = vocab[p] == flat_local if len(vocab) else np.zeros(len(p), bool)
            col = p[hit].astype(np.uint64)
            np.bitwise_or.at(
                M,
                (rows[hit], (col >> np.uint64(6)).astype(np.int64)),
                np.uint64(1) << (col & np.uint64(63)),
            )
            la = np.searchsorted(docs, ai)
            lb = np.searchsorted(docs, bi)
            return self._popcount_pairs(M, la, lb, self.lens[ai], self.lens[bi])
        return self._jaccard_loop(ai, bi)

    def _jaccard_loop(self, ai: np.ndarray, bi: np.ndarray) -> np.ndarray:
        off, flat = self.offsets, self.flat
        sims = np.empty(len(ai), np.float64)
        for i in range(len(ai)):
            a, b = ai[i], bi[i]
            sims[i] = jaccard_sets(flat[off[a] : off[a + 1]], flat[off[b] : off[b + 1]])
        return sims


_POP16: np.ndarray | None = None


def _popcount16_lut() -> np.ndarray:
    """uint16 -> popcount lookup table (64 KiB, built once per process)."""
    global _POP16
    if _POP16 is None:
        v = np.arange(65536, dtype=np.uint16)
        _POP16 = (
            np.unpackbits(v.view(np.uint8).reshape(-1, 2), axis=1).sum(axis=1).astype(np.uint16)
        )
    return _POP16


# Bitset scoring is only worth the U x V/8 bytes when the batch's distinct
# shingle vocabulary is small -- exactly the regime where prefix/LSH
# blocking degenerates and candidate pairs blow up toward all-pairs. A
# large per-batch vocabulary means blocking already made pairs rare, so
# the per-pair sorted-intersection fallback stays cheap.
_BITSET_VOCAB_CAP = 1 << 15
_PAIR_SLAB = 16384  # keep AND/popcount slabs cache-resident under concurrency


def jaccard_pairs_batch(
    a_texts: list, b_texts: list, shingle_k: int
) -> np.ndarray:
    """Exact set-jaccard for N (a, b) text pairs — vectorized.

    Shingles each distinct text once, then scores all pairs through a
    batch-local :class:`DocShingleIndex` (df>=2-vocabulary bitsets,
    ``inter = popcount(A & B)`` via a uint16 LUT, cache-resident pair
    slabs; per-pair sorted intersection when the vocabulary is too wide).
    Bit-for-bit identical to per-pair :func:`jaccard_sets`."""
    import pandas as pd

    n = len(a_texts)
    if not n:
        return np.empty(0, np.float64)
    both = pd.Series(np.concatenate([np.asarray(a_texts, object), np.asarray(b_texts, object)]))
    codes, uniques = pd.factorize(both.fillna(""), sort=False)  # C-speed text dedup
    ai = codes[:n].astype(np.int64)
    bi = codes[n:].astype(np.int64)
    uniq = uniques.tolist()
    index = DocShingleIndex(list(range(len(uniq))), uniq, shingle_k)
    return index.jaccard_idx(ai, bi)


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


def minhash_signatures_batch(
    shingle_arrays: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_rows, num_perm) signatures for a whole batch in one shot:
    concatenate every row's shingles, compute the (total_shingles x perm)
    permutation values once, and segment-min back to rows with
    ``np.minimum.reduceat`` — value-identical to per-row
    :func:`minhash_signature` (same uint64 wrap + mod ordering)."""
    n = len(shingle_arrays)
    out = np.full((n, len(a)), _MERSENNE, dtype=np.uint64)
    if not n:
        return out
    lens = np.fromiter((len(s) for s in shingle_arrays), np.int64, count=n)
    nz = np.nonzero(lens > 0)[0]
    if not len(nz):
        return out
    with np.errstate(over="ignore"):
        cat = np.concatenate([shingle_arrays[i] for i in nz])
        prod = (cat[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    starts = np.r_[np.int64(0), np.cumsum(lens[nz])[:-1]]
    out[nz] = np.minimum.reduceat(prod, starts, axis=0)
    return out


def _band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) uint32 band-bucket hashes from an (n, num_perm)
    signature matrix — an FNV-style column mix per band, fully
    vectorized (replaces per-row-per-band crc32 calls). A (2^-32) hash
    collision merely adds a junk candidate pair, which verification
    removes."""
    n, num_perm = sig.shape
    r = num_perm // bands
    out = np.empty((n, bands), dtype=np.uint32)
    mult = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for bi in range(bands):
            h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
            for c in range(bi * r, (bi + 1) * r):
                h = (h ^ sig[:, c]) * mult
            out[:, bi] = ((h >> np.uint64(32)) ^ h).astype(np.uint32)
    return out


def _triu_pairs_by_bucket(
    bucket: np.ndarray,
    *,
    min_bucket: int = 2,
    max_bucket: int = 4096,
    sketch: np.ndarray | None = None,
    keep_fn=None,
    chunk_pairs: int = 65_536,
) -> tuple[np.ndarray, np.ndarray]:
    """All within-bucket position pairs (i, j), i-position before
    j-position, for every bucket with ``min_bucket <= size <=
    max_bucket`` — no per-bucket python loop: positions are sorted by
    bucket, grouped into (k, s) matrices per bucket-size class, and
    expanded with one ``triu_indices`` call per distinct size.

    With ``sketch`` ((n, w) uint64) and ``keep_fn(SA, SB) -> mask``, the
    pair filter is FUSED into the expansion: sketch rows are gathered
    once per bucket member (not once per pair), pair expansion reads
    them from the cache-resident per-class matrix, and only surviving
    positions are emitted. ``chunk_pairs`` bounds the expansion slabs;
    keep them small enough that a slab's temporaries stay cache-resident
    per task under full-node concurrency. Measured 32-way concurrent on
    the real 480k-doc emission (330M raw pairs, idle host): 64k and
    256k slabs are statistically tied (~30s stage wall) ONCE the
    ownership kernel reuses preallocated slab buffers; before that fix,
    big slabs amplified allocator mmap/page-zero churn under
    concurrency (observed 16-29s/task vs 7-10s/task). 64k is kept as
    the default because it bounds peak per-task temporaries (~6 MB)
    without measurable cost."""
    n = len(bucket)
    if n == 0:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    order = np.argsort(bucket, kind="stable").astype(np.int32)
    bs = bucket[order]
    starts = np.nonzero(np.r_[True, bs[1:] != bs[:-1]])[0]
    sizes = np.diff(np.r_[starts, n])
    ai_parts: list[np.ndarray] = []
    bi_parts: list[np.ndarray] = []
    for s in np.unique(sizes):
        if s < min_bucket or s > max_bucket:
            continue
        b_starts = starts[sizes == s]
        mat = order[b_starts[:, None] + np.arange(s, dtype=np.int64)[None, :]]  # (k, s)
        ii, jj = np.triu_indices(int(s), k=1)
        per = len(ii)
        skm = sketch[mat] if sketch is not None else None  # (k, s, w): one gather per member
        # two-level chunking so a slab never exceeds chunk_pairs even for
        # a single fat bucket (pair-range slices x bucket groups)
        for p0 in range(0, per, chunk_pairs):
            iis = ii[p0 : p0 + chunk_pairs]
            jjs = jj[p0 : p0 + chunk_pairs]
            kb = max(1, chunk_pairs // max(len(iis), 1))
            for c0 in range(0, mat.shape[0], kb):
                sub = mat[c0 : c0 + kb]
                if keep_fn is not None:
                    sks = skm[c0 : c0 + kb]
                    w = sks.shape[2]
                    m = keep_fn(
                        sks[:, iis, :].reshape(-1, w), sks[:, jjs, :].reshape(-1, w)
                    )
                    idx = np.nonzero(m)[0]
                    if not len(idx):
                        continue
                    # survivor-only position gather (typically ~10% of the
                    # slab): avoids materializing A/B for killed pairs
                    rows = idx // len(iis)
                    cols = idx - rows * len(iis)
                    A = sub[rows, iis[cols]]
                    B = sub[rows, jjs[cols]]
                else:
                    A = sub[:, iis].ravel()
                    B = sub[:, jjs].ravel()
                if len(A):
                    ai_parts.append(A)
                    bi_parts.append(B)
    if not ai_parts:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    return np.concatenate(ai_parts), np.concatenate(bi_parts)


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
        ids = df[id_col].to_numpy()
        ai, bi = _triu_pairs_by_bucket(df["__bucket"].to_numpy(), max_bucket=max_bucket)
        if not len(ai):
            return pd.DataFrame(
                {"a": pd.Series([], dtype=df[id_col].dtype), "b": pd.Series([], dtype=df[id_col].dtype)}
            )
        ia = ids[ai]
        ib = ids[bi]
        ok = ia != ib  # an id never repeats within a bucket by construction; guard anyway
        a = np.where(ia < ib, ia, ib)[ok]
        b = np.where(ia < ib, ib, ia)[ok]
        return pd.DataFrame({"a": a, "b": b})

    cand = (
        bucketed.map_batches(add_part, batch_format="pyarrow")
        .groupby("__bp")
        .map_groups(pairs_part, batch_format="pandas")
    )
    # a pair sharing multiple buckets appears multiple times -> distinct
    return _distinct_pairs(cand, num_partitions=num_partitions)


def _distinct_pairs(cand: rd.Dataset, num_partitions: int = 64) -> rd.Dataset:
    """Globally distinct (a, b) rows WITHOUT Ray's sort-based
    multi-column aggregate (measured minutes-slow on millions of rows):
    hash-partition on a combined pair hash, then one pandas
    ``drop_duplicates`` per partition. A given pair always lands in
    exactly one partition, so per-partition distinct is globally exact."""
    import pandas as pd

    def add_pp(t: pa.Table) -> pa.Table:
        ha = pd.util.hash_array(
            np.asarray(t["a"].to_numpy(zero_copy_only=False)), categorize=False
        )
        hb = pd.util.hash_array(
            np.asarray(t["b"].to_numpy(zero_copy_only=False)), categorize=False
        )
        h = ha * np.uint64(0x9E3779B97F4A7C15) + hb
        return t.append_column("__pp", pa.array((h % num_partitions).astype(np.int64)))

    def uniq(df: pd.DataFrame) -> pa.Table:
        # arrow out: downstream schema probes need Arrow types, not
        # pandas block dtypes
        return pa.Table.from_pandas(
            df.drop_duplicates(["a", "b"])[["a", "b"]], preserve_index=False
        )

    return (
        cand.map_batches(add_pp, batch_format="pyarrow")
        .groupby("__pp")
        .map_groups(uniq, batch_format="pandas")
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
        at = t.column("__a_text").to_pylist()
        bt = t.column("__t_text").to_pylist()
        sims = jaccard_pairs_batch(at, bt, shingle_k)
        keep = sims >= threshold
        # typed indices: an all-filtered batch would otherwise infer a
        # null-typed index array and break take
        out = t.take(pa.array(np.nonzero(keep)[0], pa.int64())).select(["a", "b"])
        return out.append_column("jaccard", pa.array(sims[keep], pa.float64()))

    return j.map_batches(verify, batch_format="pyarrow")


class _BroadcastJaccardVerify:
    """Actor-pool verifier for the small-doc-table side of candidate
    verification: a driver-built :class:`DocShingleIndex` is ``ray.put``
    once and fetched zero-copy per actor, so per-batch work collapses to
    id->row gather + ``popcount(A & B)`` slabs — no shuffle at all.
    When candidate pairs outnumber docs by orders of magnitude (the
    degenerate-blocking regime), this replaces two hash-join
    all-to-alls carrying pair x text payload. A doc table above the
    caller's broadcast limit never takes this path (join-back
    instead)."""

    def __init__(self, ref, threshold: float):
        import ray

        self.index: DocShingleIndex = ray.get(ref)
        self.threshold = float(threshold)

    def __call__(self, t: pa.Table) -> pa.Table:
        ai = self.index.lookup(t.column("a").to_pylist())
        bi = self.index.lookup(t.column("b").to_pylist())
        ok = np.nonzero((ai >= 0) & (bi >= 0))[0]  # inner-join semantics
        sims = self.index.jaccard_idx(ai[ok], bi[ok])
        hit = sims >= self.threshold
        out = t.take(pa.array(ok[hit], pa.int64())).select(["a", "b"])
        return out.append_column("jaccard", pa.array(sims[hit], pa.float64()))


def minhash_candidate_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 13,
    num_partitions: int = 64,
) -> rd.Dataset:
    """Distinct (a, b) candidate pairs from banded MinHash buckets —
    the two-stage candidate generator (bucket -> pairs -> groupby dedup);
    the fused path (:func:`lsh_fused_edges`) supersedes it when the
    verifier can run in the same stage."""
    assert num_perm % bands == 0
    a, b = _minhash_params(num_perm, seed)

    def buckets(t: pa.Table) -> pa.Table:
        idc = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        kv = (
            t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        ).to_numpy(zero_copy_only=False)
        vrows = np.nonzero(np.fromiter((v is not None for v in kv), bool, count=len(kv)))[0]
        if not len(vrows):
            return pa.table(
                {"__bucket": pa.array([], pa.uint64()), id_col: pa.array([], idc.type)}
            )
        sh = [char_shingles(kv[i], shingle_k) for i in vrows]
        SIG = minhash_signatures_batch(sh, a, b)
        BH = _band_hashes(SIG, bands)
        bucket = (
            (np.arange(bands, dtype=np.uint64)[None, :] << np.uint64(32))
            | BH.astype(np.uint64)
        ).ravel()
        return pa.table(
            {
                "__bucket": pa.array(bucket),
                id_col: idc.take(pa.array(np.repeat(vrows, bands))),
            }
        )

    bucketed = ds.map_batches(buckets, batch_format="pyarrow")
    return _pairs_from_buckets(bucketed, id_col, num_partitions=num_partitions)


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
    broadcast_doc_limit: int = 2_000_000,
    carry_cutoff: int = 128,
    tile_bucket: int | None = None,
) -> rd.Dataset:
    """Near-duplicate classes via MinHash+LSH: shingle -> minhash ->
    banded buckets -> candidate pairs -> exact-jaccard verify ->
    connected components. Returns (doc_id, dup_group) for every doc;
    dup_group = min doc_id of its duplicate class.

    Shuffle layout, selected by doc-table size and MEASURED mean text
    length (the band shuffle carries ``bands x len(text)`` bytes per
    doc, so text length decides whether carrying beats joining):

    - texts ≤ ``carry_cutoff`` bytes: :func:`lsh_fused_edges` — carrying
      a short text in each band emission is cheaper than any join-back
      or index gather (measured 42s vs 50s at 120k 63-byte docs).
    - long texts, table ≤ ``broadcast_doc_limit``: band emissions carry
      only (numeric bucket, id) — 16 bytes per band per doc — and each
      bucket partition verifies in place against a shared
      :class:`DocShingleIndex` (:func:`lsh_index_edges`); only surviving
      edges are exchanged (measured 3.6s vs 6.4s fused on 297-byte
      docs).
    - long texts, huge table: candidate pairs are deduped across bands
      and text hash-joined back — an O(distinct candidates + corpus)
      exchange vs fused's O(bands x corpus) text carry.

    All three paths compute the same exact set-jaccard over the same
    candidate set (same bucket math, same ``max_bucket`` cap), so
    results are identical.

    ``tile_bucket`` (large-bucket pair-expansion tiling) is honored by
    the fused layout only; the index/join-back layouts verify per bucket
    partition against an index, where the knob does not apply — a
    warning is emitted if it would be ignored."""
    import ray

    from fozziejoin_ray.joins.string_join import _collect_right

    # Materialize the (id, text) projection ONCE: count, the layout
    # probe, the band/bucket stage and the final id join all consume it,
    # and on a derived input each would otherwise re-execute the whole
    # upstream graph. The projection is two columns (the object store
    # spills if it must), which beats 3-4 upstream executions.
    ds = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    ).materialize()

    small = ds.count() <= broadcast_doc_limit
    mat = None
    if small:
        mat = _collect_right(ds, [id_col, text_col])
        tl = pa.compute.binary_length(pa.compute.fill_null(mat[text_col], ""))
        mean_len = float(pa.compute.mean(tl).as_py() or 0.0)
    else:
        sample = pa.concat_tables(
            ds.limit(1000).map_batches(
                lambda t: t.select([text_col]), batch_format="pyarrow"
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        )
        tl = pa.compute.binary_length(pa.compute.fill_null(sample[text_col], ""))
        mean_len = float(pa.compute.mean(tl).as_py() or 0.0)

    if mean_len > carry_cutoff and tile_bucket is not None:
        import warnings

        warnings.warn(
            "tile_bucket is honored only by the fused (short-text) LSH "
            "layout; this corpus selects the "
            + ("broadcast-index" if small else "join-back")
            + " layout, which verifies per bucket partition and ignores it",
            stacklevel=2,
        )
    if mean_len <= carry_cutoff:
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
            tile_bucket=tile_bucket,
            prefilter=JaccardSizeBoundFilter(threshold),
        )
    elif small:
        ref = ray.put(
            DocShingleIndex(mat[id_col].to_pylist(), mat[text_col].to_pylist(), shingle_k)
        )
        edges = lsh_index_edges(
            ds,
            text_col,
            id_col,
            ref,
            threshold,
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
            seed=seed,
            num_partitions=num_partitions,
        )
    else:
        cand = minhash_candidate_pairs(
            ds,
            text_col,
            id_col,
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
            seed=seed,
            num_partitions=num_partitions,
        )
        edges = _verify_pairs_jaccard(
            cand, ds, text_col, id_col, shingle_k, threshold, num_partitions
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


def simhash64_batch(texts: list) -> np.ndarray:
    """Batch SimHash, bit-identical to :func:`simhash64`: token hashes stay
    a (cheap, C-speed) python loop, but the 64-lane bit accumulation runs
    as one segment-sum over the whole batch's token stream."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if not n:
        return out
    tok_hashes: list[int] = []
    doc_idx: list[int] = []
    for i, txt in enumerate(texts):
        for tok in (txt or "").split():
            tok_hashes.append(
                zlib.crc32(tok.encode()) | (zlib.crc32(tok[::-1].encode()) << 32)
            )
            doc_idx.append(i)
    if not tok_hashes:
        return out
    H = np.array(tok_hashes, dtype=np.uint64)
    D = np.array(doc_idx, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    contrib = np.where(
        ((H[:, None] >> shifts[None, :]) & np.uint64(1)).astype(bool), 1, -1
    ).astype(np.int32)
    # doc_idx is nondecreasing -> segment boundaries + reduceat
    starts = np.nonzero(np.r_[True, D[1:] != D[:-1]])[0]
    seg = np.add.reduceat(contrib, starts, axis=0)
    acc = np.zeros((n, 64), dtype=np.int64)
    acc[D[starts]] = seg
    out = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    return (
        np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
        .reshape(len(x), 64)
        .sum(axis=1)
        .astype(np.int64)
    )


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
    candidates via the shared hash-partitioned pair builder
    (:func:`_pairs_from_buckets` — vectorized triu, singleton skip,
    oversized-bucket cap, exactly-once dedup), signatures join back onto
    the surviving pairs and a vectorized popcount verifies."""
    blocks = max_hamming + 1
    width = 64 // blocks

    # one upstream execution: signatures AND the final id join both read
    # this materialized projection
    ds = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    ).materialize()

    def sig_table(t: pa.Table) -> pa.Table:
        sigs = simhash64_batch(t.column(text_col).to_pylist())
        return pa.table({id_col: t[id_col], "__sig": pa.array(sigs)})

    sigs = ds.map_batches(sig_table, batch_format="pyarrow")

    def emit(t: pa.Table) -> pa.Table:
        sig = t.column("__sig").to_numpy(zero_copy_only=False).astype(np.uint64)
        idc = t.column(id_col)
        buckets = []
        for bi in range(blocks):
            lo = bi * width
            hi = 64 if bi == blocks - 1 else lo + width
            part = (sig >> np.uint64(lo)) & np.uint64((1 << (hi - lo)) - 1)
            # collision-free for blocks <= 8 except top-3-bit wrap on the
            # full-width block; wrap collisions only add candidates, which
            # the popcount verify removes
            buckets.append((part << np.uint64(3)) | np.uint64(bi))
        return pa.table(
            {
                "__bucket": pa.array(np.concatenate(buckets)),
                id_col: pa.concat_arrays(
                    [idc.combine_chunks() if isinstance(idc, pa.ChunkedArray) else idc] * blocks
                ),
            }
        )

    bucketed = sigs.map_batches(emit, batch_format="pyarrow")
    cand = _pairs_from_buckets(bucketed, id_col, num_partitions=num_partitions)
    j = _attach_pair_texts(cand, sigs, "__sig", id_col, num_partitions)

    def verify(t: pa.Table) -> pa.Table:
        sa = t.column("__a_text").to_numpy(zero_copy_only=False).astype(np.uint64)
        sb = t.column("__t_text").to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = _popcount64(np.bitwise_xor(sa, sb)) <= max_hamming
        return t.filter(pa.array(keep)).select(["a", "b"])

    edges = j.map_batches(verify, batch_format="pyarrow")
    return _dup_groups(ds, edges, id_col, num_partitions, id_type)


# ------------------------------------------------------- n-gram jaccard dup


def _hot_shingle_order(
    ds: rd.Dataset,
    text_col: str,
    shingle_k: int,
    *,
    min_df: int = 2,
    top_hot: int = 1 << 20,
    num_partitions: int = 32,
) -> tuple[np.ndarray, np.ndarray]:
    """(hot_sorted, hot_rank): the corpus's shingles with document
    frequency >= ``min_df``, as an int64 array sorted by hash plus the
    aligned rank of each under ascending (df, hash). Used to order
    prefix-filter emissions rarest-first. Broadcast-bounded: at most
    ``top_hot`` entries survive (highest df wins); shingles outside the
    table sort before all listed ones by raw hash, which is always
    correct — the order is a pruning heuristic, never a semantics.

    DF counting is the repo's partial-aggregate pattern: per-batch
    ``np.unique`` partial counts, hash-partitioned, one pandas sum per
    partition — no sort-based multi-column Ray aggregate."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        arrs = [
            char_shingles(x or "", shingle_k) for x in t[text_col].to_pylist()
        ]
        h = np.concatenate(arrs) if arrs else np.empty(0, np.uint64)
        u, c = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(u.view(np.int64)),
                "c": pa.array(c.astype(np.int64)),
                "__hp": pa.array((u % np.uint64(num_partitions)).astype(np.int64)),
            }
        )

    def tot(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", sort=False)["c"].sum()
        g = g[g >= min_df]
        return pd.DataFrame({"h": g.index.to_numpy(), "df": g.to_numpy()})

    pdf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__hp")
        .map_groups(tot, batch_format="pandas")
        .to_pandas()
    )
    if len(pdf) > top_hot:
        pdf = pdf.nlargest(top_hot, "df")
    if not len(pdf):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort((pdf["h"].to_numpy(), pdf["df"].to_numpy()))
    rank = np.empty(len(pdf), dtype=np.int64)
    rank[order] = np.arange(len(pdf), dtype=np.int64)
    hs = pdf["h"].to_numpy()
    byhash = np.argsort(hs)
    return hs[byhash], rank[byhash]


def ngram_jaccard_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_k: int = 5,
    threshold: float = 0.8,
    max_block_emit: int | None = None,
    num_partitions: int = 32,
    id_type=None,
    broadcast_doc_limit: int = 2_000_000,
) -> rd.Dataset:
    """Exact n-gram-Jaccard duplicate classes WITHOUT minhash
    approximation, for thresholds > 0.5: block on the ``m`` smallest
    shingle hashes (prefix filtering — two sets with jaccard >= t must
    share one of each other's smallest ceil((1-t)|S|)+1 hashes); verify
    exact jaccard in-group.

    Prefixes are taken under a document-frequency total order (rarest
    shingles first — the PPJoin ordering): the prefix theorem holds for
    ANY fixed global order, and rare-first makes prefix buckets small, so
    candidate count collapses on corpora with hot shingles. The order
    table is bounded for scale: only the ``top_hot`` highest-df shingles
    are ranked (broadcast once via ``ray.put``); everything below the cut
    sorts first by raw hash — correctness is unaffected, only candidate
    pruning quality degrades past the cap.

    Exactness caveats: setting ``max_block_emit`` truncates the prefix
    for long documents (breaking the prefix-filter completeness
    guarantee — that is why it defaults to None), and candidate buckets
    larger than :func:`_pairs_from_buckets`'s ``max_bucket`` cap are
    dropped (stop-word shingles); both are recall trade-offs to opt
    into, not defaults."""
    import ray

    # one upstream execution: the hot-shingle pass, the emit stage, the
    # count probe and the id join all read this materialized projection
    ds = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    ).materialize()

    hot_ref = ray.put(_hot_shingle_order(ds, text_col, shingle_k, num_partitions=num_partitions))

    class Emit:
        def __init__(self):
            self.hot_sorted, self.hot_rank = ray.get(hot_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_pylist()
            texts = t.column(text_col).to_pylist()
            out_bucket, out_id, counts = [], [], []
            for d, txt in zip(ids, texts):
                sh = char_shingles(txt or "", shingle_k)  # sorted by hash
                if not len(sh):
                    continue
                prefix = int(np.ceil((1 - threshold) * len(sh))) + 1
                prefix = min(prefix, len(sh))
                if max_block_emit is not None:
                    prefix = min(prefix, max_block_emit)
                si = sh.view(np.int64)
                pos = np.searchsorted(self.hot_sorted, si)
                pos[pos >= len(self.hot_sorted)] = 0
                ishot = (
                    self.hot_sorted[pos] == si
                    if len(self.hot_sorted)
                    else np.zeros(len(si), dtype=bool)
                )
                # cold (rank 0) first by hash, hot ascending df-rank last
                rank = np.where(ishot, self.hot_rank[pos] + 1, 0)
                order = np.lexsort((si, rank))[:prefix]
                out_bucket.append(si[order])
                out_id.append(d)
                counts.append(len(order))
            if not out_bucket:
                return pa.table(
                    {
                        "__bucket": pa.array([], pa.int64()),
                        id_col: pa.array([], type=t.column(id_col).type),
                    }
                )
            return pa.table(
                {
                    "__bucket": pa.array(np.concatenate(out_bucket)),
                    id_col: pa.array(
                        np.repeat(np.asarray(out_id, dtype=object), counts),
                        type=t.column(id_col).type,
                    ),
                }
            )

    bucketed = ds.map_batches(Emit, batch_format="pyarrow", concurrency=(1, 8))
    cand = _pairs_from_buckets(bucketed, id_col, num_partitions=num_partitions)
    # candidate counts can dwarf the doc table (degenerate blocking on
    # small-vocabulary corpora): when docs fit a broadcast, verify with a
    # shuffle-free actor pool instead of two pair x text hash joins
    if ds.count() <= broadcast_doc_limit:
        from fozziejoin_ray.joins.string_join import _collect_right

        mat = _collect_right(ds, [id_col, text_col])
        ref = ray.put(
            DocShingleIndex(mat[id_col].to_pylist(), mat[text_col].to_pylist(), shingle_k)
        )
        verified = cand.map_batches(
            _BroadcastJaccardVerify,
            fn_constructor_args=(ref, threshold),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
    else:
        verified = _verify_pairs_jaccard(
            cand, ds, text_col, id_col, shingle_k, threshold, num_partitions
        )
    return _dup_groups(ds, verified, id_col, num_partitions, id_type)


def _cross_pairs_by_bucket(
    bucket: np.ndarray,
    side: np.ndarray,
    *,
    max_bucket: int = 4096,
    sketch: np.ndarray | None = None,
    keep_fn=None,
    chunk_pairs: int = 65_536,
) -> tuple[np.ndarray, np.ndarray]:
    """Two-table analog of :func:`_triu_pairs_by_bucket`: within every
    bucket, all (side-0 position, side-1 position) pairs, vectorized —
    sort once by (bucket, side), count each side per bucket with one
    cumsum, expand with the shared variable-size cross product. Buckets
    with a side larger than ``max_bucket`` are dropped (the stop-word
    cap). ``sketch``/``keep_fn`` fuse a recall-lossless pair filter into
    chunked expansion slabs."""
    n = len(bucket)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort((side, bucket))
    bs, ss = bucket[order], side[order]
    starts = np.nonzero(np.r_[True, bs[1:] != bs[:-1]])[0]
    ends = np.r_[starts[1:], n]
    cs = np.r_[0, np.cumsum(ss == 0)]
    l_cnt = cs[ends] - cs[starts]
    r_cnt = (ends - starts) - l_cnt
    kept = (l_cnt >= 1) & (r_cnt >= 1) & (l_cnt <= max_bucket) & (r_cnt <= max_bucket)
    ks, kl, kr = starts[kept], l_cnt[kept], r_cnt[kept]
    if keep_fn is None or sketch is None:
        from ..blocking.strategies import _cross_expand

        rep, al, bl = _cross_expand(kl, kr)
        if not len(rep):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return order[ks[rep] + al], order[ks[rep] + kl[rep] + bl]
    # FUSED filter path: survivors-only materialization — never the
    # full raw cross (which for a hot partition is GBs of int64 churn;
    # the unfused expand-then-filter shape measured 7x slower under
    # full-node concurrency on the 480k-doc corpus).
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    pairs_per = kl * kr
    # Tiny buckets (bulk of a long-tail partition): per-(l,r)-class
    # overhead would dominate, so walk their concatenated pair-index
    # space in bounded slabs (searchsorted + div per pair is fine at
    # this volume). Bigger buckets take the class-matrix path below —
    # same shape as _triu_pairs_by_bucket, ~3x cheaper per pair.
    tiny = pairs_per <= 4096
    if tiny.any():
        tks, tkl, tkr = ks[tiny], kl[tiny], kr[tiny]
        cum = np.r_[np.int64(0), np.cumsum(tkl * tkr)]
        total = int(cum[-1])
        for p0 in range(0, total, chunk_pairs):
            idx = np.arange(p0, min(p0 + chunk_pairs, total), dtype=np.int64)
            g = np.searchsorted(cum, idx, side="right") - 1
            off = idx - cum[g]
            al = off // tkr[g]
            bl = off - al * tkr[g]
            ac = order[tks[g] + al]
            bc = order[tks[g] + tkl[g] + bl]
            m = keep_fn(sketch[ac], sketch[bc])
            out_a.append(ac[m])
            out_b.append(bc[m])
    big = ~tiny
    if big.any():
        bks, bkl, bkr = ks[big], kl[big], kr[big]
        cls = (bkl << np.int64(32)) | bkr
        for key in np.unique(cls):
            sel = cls == key
            l = int(key >> np.int64(32))
            r = int(key & np.int64(0xFFFFFFFF))
            b_starts = bks[sel]
            span = l + r
            # (k, l+r) position matrix; one sketch gather per MEMBER
            mat = order[b_starts[:, None] + np.arange(span, dtype=np.int64)[None, :]]
            ii = np.repeat(np.arange(l, dtype=np.int64), r)
            jj = l + np.tile(np.arange(r, dtype=np.int64), l)
            per = l * r
            skm = sketch[mat]  # (k, l+r, w)
            for p0 in range(0, per, chunk_pairs):
                iis = ii[p0 : p0 + chunk_pairs]
                jjs = jj[p0 : p0 + chunk_pairs]
                kb = max(1, chunk_pairs // max(len(iis), 1))
                for c0 in range(0, mat.shape[0], kb):
                    sub = mat[c0 : c0 + kb]
                    sks = skm[c0 : c0 + kb]
                    w = sks.shape[2]
                    m = keep_fn(
                        sks[:, iis, :].reshape(-1, w), sks[:, jjs, :].reshape(-1, w)
                    )
                    idx = np.nonzero(m)[0]
                    if not len(idx):
                        continue
                    rows = idx // len(iis)
                    cols = idx - rows * len(iis)
                    out_a.append(sub[rows, iis[cols]])
                    out_b.append(sub[rows, jjs[cols]])
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_a), np.concatenate(out_b)


def _own_pairs_mask(
    bucket: np.ndarray,
    BHp: np.ndarray,
    ai: np.ndarray,
    bi: np.ndarray,
    capped: np.ndarray,
    bands: int,
    slab: int = 8_192,
) -> np.ndarray:
    """First-agreeing-band ownership mask: True where the band of
    ``bucket[ai]`` is the FIRST non-capped band whose band hashes agree
    for the pair. Capped buckets are RARE, so exclusion is unpacked per
    band into a handful of vector compares — never a sort-based isin.

    ``slab`` bounds the per-chunk temporaries, and the chunk buffers are
    preallocated ONCE and refilled with ``np.take(..., out=)`` /
    ``np.equal(..., out=)``: the band-hash table itself is a few MB and
    cache-resident, so with throwaway slab temporaries this kernel's
    cost is pure allocator+DRAM churn (measured 4 µs/pair at 32-way
    concurrency for 262k-pair slabs — every temp is an mmap+page-zero
    cycle). 8k-pair slabs keep the whole working set (~2.6 MB) inside a
    private 2 MB L2 + allocator reuse, which is what lets 8->32 CPU
    scaling hold on this stage."""
    n = len(ai)
    own = np.empty(n, bool)
    if n == 0:
        return own
    cap_by_band: dict[int, np.ndarray] = {}
    for cb in capped:
        b = int(cb >> np.uint64(32))
        cap_by_band.setdefault(b, []).append(np.uint32(cb & np.uint64(0xFFFFFFFF)))
    cap_by_band = {b: np.array(v, np.uint32) for b, v in cap_by_band.items()}
    j_band = (bucket[ai] >> np.uint64(32)).astype(np.int64)
    BHc = np.ascontiguousarray(BHp)
    A = np.empty((min(slab, n), bands), BHc.dtype)
    B = np.empty((min(slab, n), bands), BHc.dtype)
    agree = np.empty((min(slab, n), bands), bool)
    hit = np.empty(min(slab, n), bool)
    hit2 = np.empty(min(slab, n), bool)
    for c0 in range(0, n, slab):
        m = min(slab, n - c0)
        sl = slice(c0, c0 + m)
        Av, Bv, agv = A[:m], B[:m], agree[:m]
        np.take(BHc, ai[sl], axis=0, out=Av)
        np.take(BHc, bi[sl], axis=0, out=Bv)
        np.equal(Av, Bv, out=agv)
        for b, hv in cap_by_band.items():
            col = Av[:, b]
            hv0 = np.equal(col, hv[0], out=hit[:m])
            for h in hv[1:]:
                hv0 |= np.equal(col, h, out=hit2[:m])
            agv[:, b] &= ~hv0
        own[sl] = np.argmax(agv, axis=1) == j_band[sl]
    return own


def _bucket_census(
    emitted: rd.Dataset,
    max_bucket: int,
    tile_bucket: int | None = None,
    two_table: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Global LSH bucket census: (capped_ids, tile_ids, tile_nb).

    ``capped_ids`` — sorted u64 ids of globally-capped buckets (count >
    max_bucket; per (bucket, side) in two-table mode, collapsed back to
    bucket ids): the stop-word cap, dropped entirely.

    ``tile_ids``/``tile_nb`` (only when ``tile_bucket`` is set) — sorted
    ids and block counts of LARGE buckets (tile_bucket < count <=
    max_bucket; max over sides in two-table mode). Their quadratic pair
    expansion is an indivisible straggler atom when one partition owns
    the whole bucket (a near-cap bucket is ~max_bucket^2/2 pairs — tens
    of seconds of one core while the rest of the node idles), so
    lsh_fused_edges tiles them: rows split into nb = ceil(count /
    tile_bucket) blocks and each block-pair routes to its own partition.

    Two cheap passes over the materialized emission — the counts never
    shuffle. Pass 1 (pigeonhole prune): a bucket with global count > T
    over B blocks must have >= ceil((T+1)/B) rows in SOME block, so
    per-block partials below that threshold can't belong to a candidate
    and never reach the driver. Pass 2 exact-counts only the surviving
    candidates, folded vectorized (unique + bincount), no Python rows."""

    def _sided(t: pa.Table) -> np.ndarray:
        col = (
            t["__bucket"].combine_chunks() if isinstance(t["__bucket"], pa.ChunkedArray) else t["__bucket"]
        ).to_numpy(zero_copy_only=False)
        if two_table:
            sd = t["__lsh_side"].to_numpy(zero_copy_only=False).astype(np.uint64)
            col = (col << np.uint64(1)) | sd
        return col

    # prune with the smaller threshold so BOTH capped and tile-large
    # candidates survive pass 1 (tile_bucket > max_bucket just disables
    # tiling — every bucket that big is capped anyway)
    census_thresh = min(tile_bucket, max_bucket) if tile_bucket is not None else max_bucket
    n_blocks = max(1, emitted.num_blocks())
    part_thresh = -(-(census_thresh + 1) // n_blocks)  # ceil

    def candidate_counts(t: pa.Table) -> pa.Table:
        u, c = np.unique(_sided(t), return_counts=True)
        big = c >= part_thresh
        return pa.table({"__bucket": pa.array(u[big], pa.uint64())})

    cand = np.unique(
        np.concatenate(
            [
                bt["__bucket"].to_numpy(zero_copy_only=False)
                # batch_size=None (one batch per block) is REQUIRED for
                # the pigeonhole bound: part_thresh is valid only if
                # each block's counts are seen whole, never split
                for bt in emitted.map_batches(
                    candidate_counts, batch_format="pyarrow", batch_size=None
                ).iter_batches(batch_size=None, batch_format="pyarrow")
            ]
            or [_EMPTY_U64]
        )
    )
    uu = _EMPTY_U64
    tot = np.empty(0, np.int64)
    if len(cand):
        cand_ref = ray.put(cand)

        def exact_counts(t: pa.Table) -> pa.Table:
            want = ray.get(cand_ref)
            col = _sided(t)
            col = col[np.isin(col, want)]
            u, c = np.unique(col, return_counts=True)
            return pa.table({"__bucket": pa.array(u, pa.uint64()), "n": pa.array(c.astype(np.int64))})

        us: list[np.ndarray] = []
        cs: list[np.ndarray] = []
        for bt in emitted.map_batches(exact_counts, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            us.append(bt["__bucket"].to_numpy(zero_copy_only=False))
            cs.append(bt["n"].to_numpy(zero_copy_only=False))
        if us:
            u_all = np.concatenate(us)
            c_all = np.concatenate(cs)
            uu, inv = np.unique(u_all, return_inverse=True)
            tot = np.bincount(inv, weights=c_all).astype(np.int64)

    capped_ids = uu[tot > max_bucket]
    if two_table and len(capped_ids):
        # a capped side caps the whole bucket for ownership eligibility
        capped_ids = np.unique(capped_ids >> np.uint64(1))

    tile_ids = _EMPTY_U64
    tile_nb = np.empty(0, np.int64)
    if tile_bucket is not None and len(uu):
        lm = (tot > tile_bucket) & (tot <= max_bucket)
        if two_table:
            lb = uu[lm] >> np.uint64(1)
            ub, invb = np.unique(lb, return_inverse=True)
            mx = np.zeros(len(ub), np.int64)
            np.maximum.at(mx, invb, tot[lm])
            keep = ~np.isin(ub, capped_ids)
            tile_ids, sz = ub[keep], mx[keep]
        else:
            tile_ids, sz = uu[lm], tot[lm]
        # block count per tiled bucket; int8 block labels downstream
        tile_nb = np.minimum(-(-sz // tile_bucket), 127).astype(np.int64)
    return capped_ids, tile_ids, tile_nb


def _capped_bucket_ids(
    emitted: rd.Dataset, max_bucket: int, two_table: bool = False
) -> np.ndarray:
    """Sorted u64 ids of globally-capped LSH buckets (see _bucket_census)."""
    capped, _, _ = _bucket_census(emitted, max_bucket, None, two_table)
    return capped


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
    tile_bucket: int | None = None,
    prefilter=None,
    right: rd.Dataset | None = None,
    right_text_col: str | None = None,
    right_id_col: str | None = None,
) -> rd.Dataset:
    """Fused LSH candidate generation + verification -> (a, b, score),
    each surviving pair exactly once with a < b.

    LARGE-BUCKET TILING (``tile_bucket``): a bucket's pair expansion is
    an indivisible atom owned by one partition task — ~count^2/2 pairs
    of ONE core while the rest of the node drains. Buckets with
    tile_bucket < count <= max_bucket (known from the same census pass
    that finds capped buckets) are split into nb = ceil(count /
    tile_bucket) blocks by hash(id) % nb, and every block pair (lo <=
    hi) routes to its own partition: each row is replicated nb times
    (to the nb block pairs containing its block), diagonal tiles pair
    via triu, off-diagonal tiles via the two-side cross kernel. The
    union over tiles is exactly the bucket's triu, each pair exactly
    once; ownership/cap semantics are untouched because they read the
    original ``__bucket``/``__bh`` columns, which tiling never
    modifies (verified bit-identical in tests).

    DEFAULT OFF: with the default ``max_bucket=4096`` the worst atom is
    ~8.4M pairs — single-digit seconds — and the 480k-doc corpus
    measured tiling as a net LOSS there (+60% stage cpu-s: the off-
    diagonal cross path costs ~1.5x the triu class-matrix per pair and
    census-large rows double the emission exchange). Enable it (e.g.
    tile_bucket = max_bucket // 2) when RAISING max_bucket for full
    recall on hot buckets — a 100k-row bucket is 5e9 pairs, hours of
    one core, and tiling is what makes that cap feasible.

    Emission rows carry (numeric bucket = band<<32 | band_hash, id,
    text, the row's full band-hash vector). Each bucket-hash partition
    builds candidate pairs with one vectorized triu expansion per
    bucket-size class and verifies them in ONE ``score_fn(list_a,
    list_b) -> (keep_mask, scores)`` call.

    Exactly-once is enforced by FIRST-AGREEING-BAND OWNERSHIP, not a
    dedup exchange: a candidate pair is kept only in the partition of
    the first band whose (non-capped) bucket contains both rows — a
    vectorized compare over the carried band-hash vectors. Round-3
    measured the alternative (score every co-bucketed pair, dedup the
    survivors with a pair-keyed groupby) at 20.5M scored rows for 2.0M
    unique edges on the 120k bench corpus: MATCHING pairs agree in ~10
    of 32 bands, so the dedup exchange moved 10x the final edge volume
    and verification scored each match 10x. Ownership removes both at
    the cost of ``4*bands`` bytes per emission row and one tiny
    bucket-count exchange (u64+count) to broadcast the globally-capped
    bucket set, keeping the capped-bucket semantics — pair survives iff
    ANY non-capped band co-buckets it — bit-identical to the dedup
    design.

    Signatures are batch-vectorized (segment-min over the batch's
    concatenated shingles, :func:`minhash_signatures_batch`); rows with
    null text are skipped (NA never matches); buckets larger than
    ``max_bucket`` are dropped (the standard LSH stop-word cap — a
    documented recall caveat).

    ``prefilter`` (optional) is a metric-specific RECALL-LOSSLESS cheap
    pair filter applied before ``score_fn``: an object with
    ``width`` (ints per row), ``sketch(texts) -> (n, width) uint64`` and
    ``keep(SA, SB) -> bool mask`` (SA/SB gathered sketch rows). It cuts
    the expensive verification volume (measured ~10x for the jaro bound
    on the bench corpus) at the cost of ``8*width`` bytes per emission.

    ``right`` switches to TWO-TABLE mode (the scale path for joining two
    huge tables under an all-pairs metric like jw): both sides emit into
    the same band buckets tagged with a side bit, candidates are the
    within-bucket left x right cross products, and edges come back as
    (a = left id, b = right id, score) — no canonical swap.
    """
    import pandas as pd

    two_table = right is not None
    rtc = right_text_col or text_col
    ric = right_id_col or id_col

    rows_per_band = num_perm // bands
    assert rows_per_band * bands == num_perm
    ma, mb = _minhash_params(num_perm, seed)

    skw = int(prefilter.width) if prefilter is not None else 0

    def make_buckets(side_num: int, tcol: str, icol: str):
        def buckets(t: pa.Table) -> pa.Table:
            idc = t[icol].combine_chunks() if isinstance(t[icol], pa.ChunkedArray) else t[icol]
            tc = t[tcol].combine_chunks() if isinstance(t[tcol], pa.ChunkedArray) else t[tcol]
            kv = tc.to_numpy(zero_copy_only=False)
            vrows = np.nonzero(
                np.fromiter((v is not None for v in kv), bool, count=len(kv))
            )[0]
            if not len(vrows):
                cols = {
                    "__bucket": pa.array([], pa.uint64()),
                    id_col: pa.array([], idc.type),
                    text_col: pa.array([], pa.string()),
                    "__lsh_side": pa.array([], pa.int8()),
                    "__bh": pa.array([], pa.list_(pa.uint32(), bands)),
                }
                if prefilter is not None:
                    cols["__sk"] = pa.array([], pa.list_(pa.uint64(), skw))
                return pa.table(cols)
            sh = [char_shingles(kv[i], shingle_k) for i in vrows]
            SIG = minhash_signatures_batch(sh, ma, mb)
            BH = _band_hashes(SIG, bands)  # (m, bands) uint32
            bucket = (
                (np.arange(bands, dtype=np.uint64)[None, :] << np.uint64(32))
                | BH.astype(np.uint64)
            ).ravel()  # row-major: per source row, bands consecutive
            take = pa.array(np.repeat(vrows, bands))
            cols = {
                "__bucket": pa.array(bucket),
                id_col: idc.take(take),
                text_col: tc.take(take),
                "__lsh_side": pa.array(np.full(len(bucket), side_num, np.int8)),
                # every emission row carries its source row's FULL
                # band-hash vector — the ownership filter's input
                "__bh": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(BH, bands, axis=0).ravel(), pa.uint32()), bands
                ),
            }
            if prefilter is not None:
                SK = prefilter.sketch([kv[i] for i in vrows], shingles=sh)  # (m, width) uint64
                rep = np.repeat(SK, bands, axis=0)
                cols["__sk"] = pa.FixedSizeListArray.from_arrays(
                    pa.array(rep.ravel(), pa.uint64()), skw
                )
            return pa.table(cols)

        return buckets

    def _route_plain(t: pa.Table, bp: np.ndarray, n: int) -> pa.Table:
        return (
            t.append_column("__bp", pa.array(bp))
            .append_column("__tp", pa.array(np.full(n, -1, np.int16)))
            .append_column("__tc", pa.array(np.zeros(n, np.int8)))
        )

    def make_route(tiles):
        """Partition router. Untiled rows go to hash(bucket) % P as one
        copy; rows of census-large buckets are replicated once per peer
        block and each (bucket, block-pair) routes independently."""

        def route(t: pa.Table) -> pa.Table:
            col = t["__bucket"].combine_chunks() if isinstance(t["__bucket"], pa.ChunkedArray) else t["__bucket"]
            bk = np.asarray(col.to_numpy(zero_copy_only=False))
            h = pd.util.hash_array(bk, categorize=False)
            bp = (h % num_partitions).astype(np.int64)
            n = len(bk)
            if tiles is None or n == 0:
                return _route_plain(t, bp, n)
            lid, lnb = tiles
            pos = np.minimum(np.searchsorted(lid, bk), len(lid) - 1)
            isbig = lid[pos] == bk
            if not isbig.any():
                return _route_plain(t, bp, n)
            small_idx = np.nonzero(~isbig)[0]
            big_idx = np.nonzero(isbig)[0]
            nbv = lnb[pos[big_idx]]
            ids = (
                t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
            ).to_numpy(zero_copy_only=False)
            hid = pd.util.hash_array(np.asarray(ids[big_idx]), categorize=False)
            c_own = (hid % nbv.astype(np.uint64)).astype(np.int64)
            # one copy per peer block: vectorized ragged arange
            reps = np.repeat(big_idx, nbv)
            tot = int(nbv.sum())
            c2 = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(nbv) - nbv, nbv)
            co = np.repeat(c_own, nbv)
            if two_table:
                sd = t["__lsh_side"].to_numpy(zero_copy_only=False)[reps].astype(np.int64)
                lo = np.where(sd == 0, co, c2)  # (left block, right block)
                hi = np.where(sd == 0, c2, co)
            else:
                lo = np.minimum(co, c2)
                hi = np.maximum(co, c2)
            tp_big = (lo << 7 | hi).astype(np.int16)  # nb <= 127
            hb_big = h[reps] ^ (
                (tp_big.astype(np.uint64) + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
            )
            take_idx = np.concatenate([small_idx, reps])
            out = t.take(pa.array(take_idx))
            tp_all = np.concatenate([np.full(len(small_idx), -1, np.int16), tp_big])
            tc_all = np.concatenate([np.zeros(len(small_idx), np.int8), co.astype(np.int8)])
            bp_all = np.concatenate(
                [bp[small_idx], (hb_big % np.uint64(num_partitions)).astype(np.int64)]
            )
            return (
                out.append_column("__bp", pa.array(bp_all))
                .append_column("__tp", pa.array(tp_all))
                .append_column("__tc", pa.array(tc_all))
            )

        return route

    def score_part(t: pa.Table, capped_ref=None) -> pa.Table:
        idt = t.schema.field(id_col).type
        empty = pa.table(
            {
                "a": pa.array([], idt),
                "b": pa.array([], idt),
                "score": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        bucket = (
            t["__bucket"].combine_chunks() if isinstance(t["__bucket"], pa.ChunkedArray) else t["__bucket"]
        ).to_numpy(zero_copy_only=False)
        S = None
        if prefilter is not None:
            skarr = t["__sk"].combine_chunks() if isinstance(t["__sk"], pa.ChunkedArray) else t["__sk"]
            S = skarr.flatten().to_numpy(zero_copy_only=False).reshape(-1, skw)
        keepf = prefilter.keep if prefilter is not None else None
        # pairing group key: (bucket, tile-pair) when any row is tiled —
        # lexsort-factorized so two tiles of one bucket (or of colliding
        # buckets) never merge; plain bucket otherwise (fast path)
        tparr = t["__tp"].to_numpy(zero_copy_only=False)
        tiled = bool((tparr != -1).any())
        if tiled:
            tp64 = tparr.astype(np.int64)
            order = np.lexsort((tp64, bucket))
            bs, ts = bucket[order], tp64[order]
            brk = np.r_[True, (bs[1:] != bs[:-1]) | (ts[1:] != ts[:-1])]
            gk = np.empty(len(bucket), np.int64)
            gk[order] = np.cumsum(brk) - 1
        else:
            gk = bucket
        if two_table:
            # tiles are (left block, right block) pairs: the one cross
            # call over the composite key handles tiled and plain alike
            side = t["__lsh_side"].to_numpy(zero_copy_only=False)
            ai, bi = _cross_pairs_by_bucket(
                gk, side, max_bucket=max_bucket, sketch=S, keep_fn=keepf
            )
        elif not tiled:
            ai, bi = _triu_pairs_by_bucket(
                gk, max_bucket=max_bucket, sketch=S, keep_fn=keepf
            )
        else:
            # diagonal tiles (and untiled buckets) pair via triu;
            # off-diagonal tiles via the two-side cross kernel with
            # side = (this row's block == the tile's high block)
            lo, hi = tp64 >> 7, tp64 & 127
            diag = (tparr == -1) | (lo == hi)
            d_idx = np.nonzero(diag)[0]
            c_idx = np.nonzero(~diag)[0]
            pa_parts: list[np.ndarray] = []
            pb_parts: list[np.ndarray] = []
            if len(d_idx):
                aid, bid = _triu_pairs_by_bucket(
                    gk[d_idx], max_bucket=max_bucket,
                    sketch=S[d_idx] if S is not None else None, keep_fn=keepf,
                )
                pa_parts.append(d_idx[aid])
                pb_parts.append(d_idx[bid])
            if len(c_idx):
                tc = t["__tc"].to_numpy(zero_copy_only=False).astype(np.int64)
                sidec = (tc[c_idx] == hi[c_idx]).astype(np.int8)
                aic, bic = _cross_pairs_by_bucket(
                    gk[c_idx], sidec, max_bucket=max_bucket,
                    sketch=S[c_idx] if S is not None else None, keep_fn=keepf,
                )
                pa_parts.append(c_idx[aic])
                pb_parts.append(c_idx[bic])
            ai = np.concatenate(pa_parts) if pa_parts else np.empty(0, np.int64)
            bi = np.concatenate(pb_parts) if pb_parts else np.empty(0, np.int64)
        if not len(ai):
            return empty
        # first-agreeing-band ownership: keep the pair only when THIS
        # band is the first non-capped band whose bucket holds both rows
        bharr = t["__bh"].combine_chunks() if isinstance(t["__bh"], pa.ChunkedArray) else t["__bh"]
        BHp = bharr.flatten().to_numpy(zero_copy_only=False).reshape(-1, bands)
        capped = ray.get(capped_ref) if capped_ref is not None else _EMPTY_U64
        own = _own_pairs_mask(bucket, BHp, ai, bi, capped, bands)
        ai, bi = ai[own], bi[own]
        if not len(ai):
            return empty
        kv = (
            t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        ).to_numpy(zero_copy_only=False)
        ids = (
            t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        ).to_numpy(zero_copy_only=False)
        # numpy object arrays go straight to the score_fn — materializing
        # python lists here costs more than the string kernel itself
        keep, scores = score_fn(kv[ai], kv[bi])
        ra = ids[ai[keep]]
        rb = ids[bi[keep]]
        if two_table:
            src, dst = ra, rb  # (left id, right id): no canonical swap
        else:
            src = np.where(ra < rb, ra, rb)
            dst = np.where(ra < rb, rb, ra)
        return pa.table(
            {
                "a": pa.array(src, idt),
                "b": pa.array(dst, idt),
                "score": pa.array(np.asarray(scores, np.float64)),
            }
        )

    emitted = ds.map_batches(make_buckets(0, text_col, id_col), batch_format="pyarrow")
    if two_table:
        emitted = emitted.union(
            right.map_batches(make_buckets(1, rtc, ric), batch_format="pyarrow")
        )
    # One census over the materialized emission feeds both broadcasts:
    # globally-capped buckets (the stop-word cap, so every partition's
    # ownership check agrees) and census-large buckets (tiled so no
    # single partition owns a near-cap bucket's quadratic expansion).
    emitted = emitted.materialize()
    capped, tile_ids, tile_nb = _bucket_census(
        emitted, max_bucket, tile_bucket, two_table
    )
    capped_ref = ray.put(capped)
    tiles = (tile_ids, tile_nb) if len(tile_ids) else None

    import functools

    return (
        emitted.map_batches(make_route(tiles), batch_format="pyarrow")
        .groupby("__bp")
        .map_groups(
            functools.partial(score_part, capped_ref=capped_ref), batch_format="pyarrow"
        )
    )


_INDEX_CACHE: dict = {}


def _get_index(ref) -> "DocShingleIndex":
    """Per-worker-process cache for a broadcast DocShingleIndex: ray.get
    re-unpickles the ids list on every call, so memoize by object ref
    (numpy payloads stay zero-copy plasma views either way)."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    got = _INDEX_CACHE.get(key)
    if got is None:
        import ray

        got = ray.get(ref)
        _INDEX_CACHE.clear()  # one live index per worker is plenty
        _INDEX_CACHE[key] = got
    return got


def lsh_index_edges(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    index_ref,
    threshold: float,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 13,
    num_partitions: int = 64,
    max_bucket: int = 4096,
) -> rd.Dataset:
    """Fused LSH candidates + exact-jaccard verify against a broadcast
    :class:`DocShingleIndex` -> (a, b, score), each surviving pair once.

    The slim sibling of :func:`lsh_fused_edges` for when the doc table
    fits a broadcast: band emissions carry (numeric bucket, id, the
    row's band-hash vector) — no text, no sketch vector — because each
    bucket-partition task verifies pairs by gathering bitset rows from
    the shared index (zero-copy ``ray.get``). The size-bound prefilter
    (``J <= min|S|/max|S|``) is applied from the index's length column,
    shipped nowhere. Exactly-once comes from the same first-agreeing-
    band ownership as the fused path (:func:`_own_pairs_mask` — a pair
    agreeing in k bands is popcount-scored ONCE, not k times, and no
    pair-dedup exchange runs). Identical output to the fused/text path:
    same bucket math, caps, and exact jaccard."""
    import pandas as pd

    rows_per_band = num_perm // bands
    assert rows_per_band * bands == num_perm
    ma, mb = _minhash_params(num_perm, seed)
    thr = float(threshold)

    def buckets(t: pa.Table) -> pa.Table:
        idc = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        tc = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        kv = tc.to_numpy(zero_copy_only=False)
        vrows = np.nonzero(np.fromiter((v is not None for v in kv), bool, count=len(kv)))[0]
        if not len(vrows):
            return pa.table(
                {
                    "__bucket": pa.array([], pa.uint64()),
                    id_col: pa.array([], idc.type),
                    "__bh": pa.array([], pa.list_(pa.uint32(), bands)),
                }
            )
        sh = [char_shingles(kv[i], shingle_k) for i in vrows]
        SIG = minhash_signatures_batch(sh, ma, mb)
        BH = _band_hashes(SIG, bands)
        bucket = (
            (np.arange(bands, dtype=np.uint64)[None, :] << np.uint64(32))
            | BH.astype(np.uint64)
        ).ravel()
        return pa.table(
            {
                "__bucket": pa.array(bucket),
                id_col: idc.take(pa.array(np.repeat(vrows, bands))),
                "__bh": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(BH, bands, axis=0).ravel(), pa.uint32()), bands
                ),
            }
        )

    def add_bp(t: pa.Table) -> pa.Table:
        col = t["__bucket"].combine_chunks() if isinstance(t["__bucket"], pa.ChunkedArray) else t["__bucket"]
        h = pd.util.hash_array(np.asarray(col.to_numpy(zero_copy_only=False)), categorize=False)
        return t.append_column("__bp", pa.array((h % num_partitions).astype(np.int64)))

    filt = JaccardSizeBoundFilter(thr)

    def score_part(t: pa.Table, capped_ref=None) -> pa.Table:
        idt = t.schema.field(id_col).type
        empty = pa.table(
            {
                "a": pa.array([], idt),
                "b": pa.array([], idt),
                "score": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        index = _get_index(index_ref)
        idc = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        gidx = index.lookup(idc.to_pylist())
        bucket = (
            t["__bucket"].combine_chunks() if isinstance(t["__bucket"], pa.ChunkedArray) else t["__bucket"]
        ).to_numpy(zero_copy_only=False)
        bharr = t["__bh"].combine_chunks() if isinstance(t["__bh"], pa.ChunkedArray) else t["__bh"]
        BHp = bharr.flatten().to_numpy(zero_copy_only=False).reshape(-1, bands)
        ok = gidx >= 0
        if not ok.all():
            keep_rows = np.nonzero(ok)[0]
            gidx, bucket, BHp = gidx[keep_rows], bucket[keep_rows], BHp[keep_rows]
            idc = idc.take(pa.array(keep_rows))
        S = index.lens[gidx].astype(np.uint64).reshape(-1, 1)
        ai, bi = _triu_pairs_by_bucket(
            bucket, max_bucket=max_bucket, sketch=S, keep_fn=filt.keep
        )
        if not len(ai):
            return empty
        capped = ray.get(capped_ref) if capped_ref is not None else _EMPTY_U64
        own = _own_pairs_mask(bucket, BHp, ai, bi, capped, bands)
        ai, bi = ai[own], bi[own]
        if not len(ai):
            return empty
        sims = index.jaccard_idx(gidx[ai], gidx[bi])
        hit = sims >= thr
        ids = idc.to_numpy(zero_copy_only=False)
        ra, rb = ids[ai[hit]], ids[bi[hit]]
        src = np.where(ra < rb, ra, rb)
        dst = np.where(ra < rb, rb, ra)
        return pa.table(
            {
                "a": pa.array(src, idt),
                "b": pa.array(dst, idt),
                "score": pa.array(sims[hit], pa.float64()),
            }
        )

    import functools

    emitted = ds.map_batches(buckets, batch_format="pyarrow").materialize()
    capped_ref = ray.put(_capped_bucket_ids(emitted, max_bucket))
    return (
        emitted.map_batches(add_bp, batch_format="pyarrow")
        .groupby("__bp")
        .map_groups(
            functools.partial(score_part, capped_ref=capped_ref), batch_format="pyarrow"
        )
    )


class JaccardSizeBoundFilter:
    """Recall-lossless cheap pair filter for jaccard thresholds:
    ``J(A, B) <= min(|A|, |B|) / max(|A|, |B|)`` — two shingle sets whose
    sizes differ by more than the threshold ratio can never reach it.
    Sketch = one uint64 (the distinct-shingle count, reusing the shingles
    already computed for the MinHash signatures); ``keep`` is two gathers
    and a division. Pairs with an empty side bypass the filter (empty vs
    empty is jaccard 1.0 by convention)."""

    width = 1

    def __init__(self, threshold: float):
        self.threshold = float(threshold)

    def sketch(self, texts: list, shingles: list | None = None) -> np.ndarray:
        if shingles is None:
            raise ValueError("JaccardSizeBoundFilter needs the shingle arrays")
        return np.fromiter((len(s) for s in shingles), np.uint64, count=len(shingles)).reshape(
            -1, 1
        )

    def keep(self, SA: np.ndarray, SB: np.ndarray) -> np.ndarray:
        na = SA[:, 0].astype(np.float64)
        nb = SB[:, 0].astype(np.float64)
        lo = np.minimum(na, nb)
        hi = np.maximum(na, nb)
        bypass = lo == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            bound = lo / hi
        return bypass | (bound >= self.threshold - 1e-12)


def jaccard_score_fn(shingle_k: int, threshold: float):
    """score_fn for lsh_fused_edges: exact set-jaccard >= threshold."""

    def fn(a_list, b_list):
        sims = jaccard_pairs_batch(a_list, b_list, shingle_k)
        keep = sims >= threshold
        return keep, sims[keep]

    return fn


def dedup_paragraphs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    sep: str = "\n\n",
    num_partitions: int = 64,
) -> rd.Dataset:
    """Exact PARAGRAPH-level dedup (the MassiveText / Lee et al. 2022
    sub-document mode): every occurrence of a paragraph that already
    appeared earlier in the corpus is removed, and each document is
    reassembled from its surviving paragraphs in original order.
    "First occurrence" is global and deterministic: the smallest
    ``(id, position)`` lexicographically. Output one row per input
    document: ``(id_col, text_col (deduped), n_paras, n_removed)`` —
    a document whose every paragraph was removed keeps an empty string.

    Paragraphs are ``sep``-delimited (literal split, empty segments
    participate uniformly); null text behaves as ``""``.

    Scale shape (two bounded exchanges, no driver state):

    1. per batch: explode to ``(id, pos, para)`` with one Arrow literal
       split — no per-row Python; route by paragraph content hash;
    2. paragraph-hash partition: all occurrences of a paragraph are
       co-located, so one composite sort (para, id, pos) + a
       first-of-run mask picks the global winners exactly; rows
       re-route by id hash;
    3. id partition: per-document position sort + separator join
       rebuilds the text; counts come from the same pass.

    The paragraph payload crosses the exchange twice — inherent to
    reassembly (content must reach the winner decision and come back).
    Skew note: a boilerplate paragraph repeated 10^9 times lands in one
    partition but arrives as occurrence ROWS that one sorted run
    resolves vectorized; the winner mask is O(rows) with no per-group
    dispatch."""
    import pandas as pd
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        idc = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        txt = pc.fill_null(t.column(text_col), "")
        paras = pc.split_pattern(txt, sep)
        if isinstance(paras, pa.ChunkedArray):
            paras = paras.combine_chunks()
        flat = paras.flatten()
        parents = pc.list_parent_indices(paras).to_numpy(zero_copy_only=False)
        # position within the parent document: global index minus the
        # parent's first global index
        starts = np.asarray(paras.offsets)[:-1]
        pos = np.arange(len(flat), dtype=np.int64) - starts[parents]
        h = pd.util.hash_array(
            np.asarray(flat.to_numpy(zero_copy_only=False)), categorize=False
        )
        return pa.table(
            {
                id_col: idc.take(pa.array(parents)),
                "__pos": pa.array(pos),
                "__para": flat,
                "__pp": pa.array((h % np.uint64(num_partitions)).astype(np.int64)),
            }
        )

    def winners(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.drop(columns=["__pp"]).sort_values(
            ["__para", id_col, "__pos"], kind="stable"
        )
        keep = ~df["__para"].duplicated().to_numpy()
        out = df.assign(__keep=keep)
        h = pd.util.hash_array(out[id_col].to_numpy(), categorize=False)
        return out.assign(__dp=(h % np.uint64(num_partitions)).astype(np.int64))

    def reassemble(df: "pd.DataFrame") -> pa.Table:
        df = df.sort_values([id_col, "__pos"], kind="stable")
        ids = df[id_col].to_numpy()
        first = np.r_[True, ids[1:] != ids[:-1]]
        starts = np.nonzero(first)[0]
        keep = df["__keep"].to_numpy(bool)
        paras = df["__para"].to_numpy(object)
        n_paras = np.diff(np.r_[starts, len(df)])
        texts = []
        removed = np.zeros(len(starts), dtype=np.int64)
        for gi, (s, n) in enumerate(zip(starts, n_paras)):
            k = keep[s : s + n]
            removed[gi] = int(n - k.sum())
            texts.append(sep.join(paras[s : s + n][k]))
        return pa.table(
            {
                id_col: pa.Array.from_pandas(pd.Series(ids[starts])),
                text_col: pa.array(texts, pa.string()),
                "n_paras": pa.array(n_paras.astype(np.int64)),
                "n_removed": pa.array(removed),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("__pp")
        .map_groups(winners, batch_format="pandas")
        .groupby("__dp")
        .map_groups(reassemble, batch_format="pandas")
    )


def cross_neardup_pairs(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    right_text_col: str | None = None,
    right_id_col: str | None = None,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_perm: int = 64,
    bands: int | None = None,
    seed: int = 13,
    num_partitions: int = 64,
    max_bucket: int = 4096,
    tile_bucket: int | None = None,
) -> rd.Dataset:
    """Cross-corpus near-duplicate detection: every (left doc, right
    doc) pair with exact char-``shingle_k``-gram set-Jaccard >=
    ``threshold`` — the two-table form of :func:`minhash_lsh_dedup`'s
    candidate machinery, for contamination sweeps of a training corpus
    against an eval corpus (or release N against release N-1) where a
    self-dedup of the union would waste the within-side pairs. Output:
    ``(a, b, score)`` with ``a`` from the left table, ``b`` from the
    right, each surviving pair exactly once; ``score`` is the exact
    verified jaccard (rounded to 6), so precision is exact and recall
    is the banded-LSH recall (``1-(1-j^r)^bands``, r = num_perm/bands —
    ~0.9999 at j = 0.5 with the 64/32 defaults, ~1.0 above).

    Scale shape: identical to the fused self-dedup path — band
    emissions carry (bucket, id, text), one bucket-hash exchange,
    in-partition cross-side pair expansion with the size-bound
    prefilter, first-agreeing-band ownership for exactly-once pairs;
    no driver-side state, both sides stream.

    SIZE GUIDANCE (measured, 32 cpus / 37 GB object store, ~300 B
    texts): the default ``bands=32`` (r=2) holds candidate recall
    ~0.9999 down to the 0.5 boundary but doubles emission volume and
    makes bucket collisions ~t^2-common — 240k x 240k ran 376 s and
    480k x 480k exhausted worker heaps. ``bands=16`` (r=4) at
    threshold >= ~0.7 measured 80.6 s at 240k x 240k with 99.87% of
    the r=2 pair set (the delta is at-threshold boundary pairs) and
    144.8 s at 480k x 480k with zero worker deaths. Rule of thumb:
    keep 32 bands only when the threshold is near 0.5 or exactness at
    the boundary matters; use 16 for bulk contamination sweeps at
    t >= 0.7."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if bands is None:
        # the measured rule above, expressed in rows-per-band so a
        # non-default num_perm keeps the intended recall regime:
        # r=2 (near-boundary-exact) below 0.7, r=4 at and above
        bands = max(1, num_perm // (2 if threshold < 0.7 else 4))
    edges = lsh_fused_edges(
        left,
        text_col,
        id_col,
        jaccard_score_fn(shingle_k, threshold),
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        seed=seed,
        num_partitions=num_partitions,
        max_bucket=max_bucket,
        tile_bucket=tile_bucket,
        prefilter=JaccardSizeBoundFilter(threshold),
        right=right,
        right_text_col=right_text_col or text_col,
        right_id_col=right_id_col or id_col,
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(
            t.column_names.index("score"),
            "score",
            pc.round(t["score"], ndigits=6, round_mode="half_towards_infinity"),
        )

    return edges.map_batches(finish, batch_format="pyarrow")
