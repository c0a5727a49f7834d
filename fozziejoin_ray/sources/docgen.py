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
