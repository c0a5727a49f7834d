"""Vectorized JSON field extraction from a string column.

Training-data tables routinely carry a JSON side-channel column
(request props, crawler metadata, annotation payloads). This operator
promotes chosen fields to typed top-level columns without any per-row
Python: each batch's JSON strings are joined into ONE newline-delimited
buffer with Arrow's C++ ``binary_join`` kernel and parsed in a single
call to ``pyarrow.json.read_json`` (Arrow's multithreaded NDJSON
reader) against an explicit schema. One allocation, one parse, zero
Python-object rows.

Semantics:
- a NULL or empty JSON string yields NULL for every extracted field
  (NA-propagation, consistent with the engine-wide NA rule);
- fields absent from a given object are NULL; extra fields are ignored;
- extracted values are cast by the Arrow reader to the caller's
  requested types (``explicit_schema``), so the output schema is stable
  even for batches where a field never appears.

Constraint (documented, checked): the NDJSON framing requires that no
JSON string contain a RAW newline byte. Spec-valid JSON never does
(control characters inside strings must be escaped as ``\\n``), but a
malformed producer could; any batch containing a raw newline falls back
to a row-wise ``json.loads`` path that preserves the same semantics.

Scale: pure ``map_batches`` — zero shuffle, streams at any table size.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_EMPTY_OBJ = "{}"


def _parse_ndjson(filled: pa.Array, schema: pa.Schema) -> pa.Table:
    import pyarrow.json as pj

    offsets = pa.array([0, len(filled)], pa.int32())
    la = pa.ListArray.from_arrays(offsets, filled.cast(pa.binary()))
    buf = pc.binary_join(la, pa.scalar(b"\n", pa.binary()))[0].as_py()
    return pj.read_json(
        io.BytesIO(buf),
        parse_options=pj.ParseOptions(
            explicit_schema=schema, unexpected_field_behavior="ignore"
        ),
    )


def _parse_rowwise(filled: pa.Array, schema: pa.Schema) -> pa.Table:
    """Fallback for malformed JSON containing raw newlines: same
    semantics (missing/unparseable -> null), per row."""
    import json

    cols: dict[str, list] = {f.name: [] for f in schema}
    for v in filled.to_pylist():
        try:
            # strict=False admits the raw control characters that routed
            # this batch to the fallback in the first place
            obj = json.loads(v, strict=False)
            if not isinstance(obj, dict):
                obj = {}
        except (ValueError, TypeError):
            obj = {}
        for f in schema:
            cols[f.name].append(obj.get(f.name))
    return pa.table(
        {f.name: pa.array(cols[f.name]).cast(f.type) for f in schema}
    )


def extract_json(
    ds: rd.Dataset,
    *,
    json_col: str,
    fields: dict[str, pa.DataType],
    prefix: str = "",
    drop_json_col: bool = False,
) -> rd.Dataset:
    """Append one typed column per entry of ``fields`` (top-level JSON
    keys), named ``prefix + key``. See module docstring for semantics."""
    if not fields:
        raise ValueError("fields must name at least one JSON key to extract")
    schema = pa.schema(list(fields.items()))

    def fn(t: pa.Table) -> pa.Table:
        col = t[json_col]
        s = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if t.num_rows == 0:
            out = t
            for f in schema:
                out = out.append_column(prefix + f.name, pa.nulls(0, f.type))
            return out.drop_columns([json_col]) if drop_json_col else out
        # null/empty -> "{}" so the NDJSON line count matches the batch
        filled = pc.coalesce(s, pa.scalar(_EMPTY_OBJ, pa.string()))
        filled = pc.if_else(
            pc.equal(pc.utf8_length(filled), 0),
            pa.scalar(_EMPTY_OBJ, pa.string()),
            filled,
        )
        has_raw_newline = pc.any(
            pc.match_substring(filled, "\n")
        ).as_py()
        if has_raw_newline:
            parsed = _parse_rowwise(filled, schema)
        else:
            try:
                parsed = _parse_ndjson(filled, schema)
            except pa.ArrowInvalid:
                # one malformed / non-object row (truncated JSON, a bare
                # array, whitespace) aborts the whole C++ parse — degrade
                # just this batch to the row-wise path, which maps the
                # offending rows to NULL fields instead of killing the job
                parsed = _parse_rowwise(filled, schema)
        if parsed.num_rows != t.num_rows:  # framing bug guard
            raise AssertionError(
                f"NDJSON parse produced {parsed.num_rows} rows for a "
                f"{t.num_rows}-row batch"
            )
        out = t
        for f in schema:
            out = out.append_column(prefix + f.name, parsed[f.name])
        return out.drop_columns([json_col]) if drop_json_col else out

    return ds.map_batches(fn, batch_format="pyarrow")
