"""Deterministic synthetic generator for the BASELINE.json ``input_hint``
table: interleaved text+media documents.

Schema (FIXTURES.md §F1):
    doc_id : string                      "d%012d"
    spans  : list<struct<kind:string, text:string,
                         media_ref:string, offset:int32>>

Each entity (a first+last name drawn from built-in lists) yields
``docs_per_entity`` documents whose FIRST text span carries a mutated
variant of the entity name (0-2 single-character edits, mirroring the
reference's misspelling vignette, /root/reference/vignettes/
overview.Rmd:56-64), interleaved with media spans
(``media_ref="m://%016x"``). Ground-truth (doc_id, entity_id) labels are
produced separately and never fed to the pipeline.

Determinism: every document is generated from an RNG seeded by
``(seed, doc_index)``, so output is identical regardless of block
partitioning or parallelism — the property that makes retries and
resumes reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

FIRST = [
    "Liam", "Noah", "Oliver", "Theodore", "James", "Olivia", "Emma", "Amelia",
    "Charlotte", "Mia", "Elijah", "Mateo", "Lucas", "Levi", "Ezra", "Luca",
    "Sophia", "Isabella", "Ava", "Evelyn", "Luna", "Harper", "Sofia", "Camila",
    "Eleanor", "Elizabeth", "William", "Henry", "Owen", "Jack", "Daniel",
    "Alexander", "Gabriel", "Samuel", "Michael", "Benjamin", "Sebastian",
]
LAST = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
    "VanDeusen", "De La Cruz", "OBrien", "McCarthy", "Ashcraft", "Tymczak",
]
FILLER = (
    "the quick brown fox jumps over a lazy dog while many other words fill "
    "the document body with plain text content for testing purposes"
).split()

ALPHABET = "abcdefghijklmnopqrstuvwxyz"

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)


def entity_name(entity_id: int) -> str:
    return f"{FIRST[entity_id % len(FIRST)]} {LAST[(entity_id // len(FIRST)) % len(LAST)]}"


def mutate_name(name: str, rng: np.random.RandomState, max_edits: int = 2) -> str:
    """0-2 seeded single-character edits (substitute/insert/delete)."""
    n_edits = rng.randint(0, max_edits + 1)
    s = list(name)
    for _ in range(n_edits):
        if not s:
            break
        op = rng.randint(0, 3)
        pos = rng.randint(0, len(s))
        if op == 0:
            s[pos] = ALPHABET[rng.randint(0, 26)]
        elif op == 1:
            s.insert(pos, ALPHABET[rng.randint(0, 26)])
        elif len(s) > 1:
            del s[pos]
    return "".join(s)


def _gen_doc(doc_idx: int, seed: int, docs_per_entity: int) -> tuple[str, list[dict], int]:
    rng = np.random.RandomState((seed * 1_000_003 + doc_idx) % (2**31 - 1))
    entity_id = doc_idx // docs_per_entity
    name = mutate_name(entity_name(entity_id), rng)
    spans = [{"kind": "text", "text": name, "media_ref": "", "offset": 0}]
    n_extra = int(rng.randint(1, 5))
    for k in range(n_extra):
        if rng.rand() < 0.35:
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": "m://%016x" % rng.randint(0, 2**31),
                    "offset": k + 1,
                }
            )
        else:
            words = " ".join(
                FILLER[rng.randint(0, len(FILLER))] for _ in range(rng.randint(3, 9))
            )
            spans.append({"kind": "text", "text": words, "media_ref": "", "offset": k + 1})
    return f"d{doc_idx:012d}", spans, entity_id


def make_documents_table(
    n_docs: int, *, seed: int = 42, docs_per_entity: int = 4, start: int = 0
) -> tuple[pa.Table, pa.Table]:
    """(documents, labels) pyarrow tables for doc indexes [start, start+n)."""
    ids, spans_col, ents = [], [], []
    for i in range(start, start + n_docs):
        d, s, e = _gen_doc(i, seed, docs_per_entity)
        ids.append(d)
        spans_col.append(s)
        ents.append(e)
    docs = pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "spans": pa.array(spans_col, pa.list_(SPAN_TYPE)),
        }
    )
    labels = pa.table(
        {"doc_id": pa.array(ids, pa.string()), "entity_id": pa.array(ents, pa.int64())}
    )
    return docs, labels


def make_documents_dataset(
    n_docs: int, *, seed: int = 42, docs_per_entity: int = 4
) -> rd.Dataset:
    """Distributed generation: each Ray task generates its doc-index range
    independently (per-doc seeding keeps it deterministic under any
    partitioning)."""

    def gen(batch: pa.Table) -> pa.Table:
        idxs = batch.column("id").to_numpy(zero_copy_only=False)
        ids, spans_col = [], []
        for i in idxs:
            d, s, _ = _gen_doc(int(i), seed, docs_per_entity)
            ids.append(d)
            spans_col.append(s)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "spans": pa.array(spans_col, pa.list_(SPAN_TYPE)),
            }
        )

    return rd.range(n_docs).map_batches(gen, batch_format="pyarrow", batch_size=8192)


def spansify_table(t: pa.Table) -> pa.Table:
    """Reshape a flat (doc_id, text) batch into the input_hint spans
    schema (interleaved text+media): first-3-words head span, a
    deterministic media span, and a rest-of-text span when non-empty.
    Vectorized — Arrow whitespace split / list_slice / binary_join build
    head+rest, the list<struct> column is assembled from flat numpy
    arrays + offsets; no per-row Python. Used by the driver harness and
    the linkage job's ``--spansify`` convenience for flat testdata."""
    import pandas as pd
    import pyarrow.compute as pc

    n = t.num_rows
    ids = t.column("doc_id")
    txt = pc.utf8_trim_whitespace(pc.fill_null(t.column("text"), ""))
    words = pc.utf8_split_whitespace(txt)
    head = pc.binary_join(pc.list_slice(words, 0, 3), " ").to_numpy(zero_copy_only=False)
    rest = pc.binary_join(pc.list_slice(words, 3), " ").to_numpy(zero_copy_only=False)
    has_rest = rest != ""
    # doc ids: ints -> d%012d, strings pass through
    if pa.types.is_integer(ids.type):
        out_ids = pc.binary_join_element_wise(
            "d", pc.utf8_lpad(pc.cast(ids, pa.string()), 12, "0"), ""
        )
    else:
        out_ids = pc.cast(ids, pa.string())
    # deterministic media ref per doc id (vectorized hash)
    h = pd.util.hash_array(
        np.asarray(ids.to_numpy(zero_copy_only=False)), categorize=False
    ) & np.uint64(0xFFFFFFFF)
    mref = np.char.add("m://", np.char.mod("%08x", h.astype(np.int64)))
    # flat span struct arrays: 2 spans per doc + 1 when rest is non-empty
    counts = np.where(has_rest, 3, 2).astype(np.int64)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])
    base = offsets[:-1]
    kind = np.empty(total, object)
    text_f = np.full(total, "", dtype=object)
    mref_f = np.full(total, "", dtype=object)
    off_f = np.empty(total, np.int32)
    kind[base] = "text"
    text_f[base] = head
    off_f[base] = 0
    kind[base + 1] = "media"
    mref_f[base + 1] = mref
    off_f[base + 1] = 1
    rsel = np.nonzero(has_rest)[0]
    kind[base[rsel] + 2] = "text"
    text_f[base[rsel] + 2] = rest[rsel]
    off_f[base[rsel] + 2] = 2
    structs = pa.StructArray.from_arrays(
        [
            pa.array(kind, pa.string()),
            pa.array(text_f, pa.string()),
            pa.array(mref_f, pa.string()),
            pa.array(off_f, pa.int32()),
        ],
        fields=list(SPAN_TYPE),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), structs)
    return pa.table({"doc_id": out_ids, "spans": spans})


def spans_fingerprint(table: pa.Table) -> dict[str, int]:
    """doc_id -> stable hash of the (kind, text, media_ref, offset)
    sequence; used to assert the span-sequence invariant end-to-end."""
    import zlib

    out = {}
    spans = table.column("spans").to_pylist()
    ids = table.column("doc_id").to_pylist()
    for d, sp in zip(ids, spans):
        blob = "|".join(
            f"{s['kind']},{s['text']},{s['media_ref']},{s['offset']}" for s in sp
        )
        out[d] = zlib.crc32(blob.encode())
    return out
