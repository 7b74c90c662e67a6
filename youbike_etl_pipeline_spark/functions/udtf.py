"""Python UDTF surface (SURVEY §2.9 table-UDF row, Spark-4-native form).

The engine's production table-generating ops are Catalyst-side
(``sequence``+``posexplode`` in ``text.py::chunk_spans`` — whole-stage
codegen, no Python in the loop). This module demonstrates the same
semantics through Spark 4's ``@udtf`` API — the right tool when the
row-expansion logic genuinely needs Python (a tokenizer library, a parser)
rather than being expressible with array functions.

Used via a lateral join::

    spark.udtf.register("chunk_text", ChunkText)
    spark.sql("SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_text(d.text, 5, 2) c")

Anti-pattern note (SCALING.md discipline): a UDTF is row-at-a-time Python —
keep it OFF the hot path unless the logic cannot be a built-in. The unit
test pins UDTF output == the explode-based ``chunk_spans`` output so the
two paths cannot drift.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, start_tok: int, chunk: string")
class ChunkText:
    """Sliding word-window chunker: yields overlapping chunks of
    ``window`` tokens every ``stride`` tokens (last partial chunk kept),
    mirroring ``text.py::chunk_spans`` semantics exactly."""

    def eval(self, text: str, window: int, stride: int):  # noqa: D102
        if text is None or window is None or stride is None or stride <= 0:
            return
        toks = text.split()
        if not toks:
            return
        idx = 0
        for start in range(0, len(toks), stride):
            yield idx, start, " ".join(toks[start : start + window])
            idx += 1
            if start + window >= len(toks):
                break


@udtf(returnType="key: string, value_int: int")
class JsonKVExplode:
    """Explode a flat JSON object into (key, int value) rows — the UDTF
    twin of ``try_parse_json``+``variant_get`` for when per-key logic
    needs Python. Malformed JSON yields no rows (try semantics)."""

    def eval(self, props: str):  # noqa: D102
        import json

        if not props:
            return
        try:
            obj = json.loads(props)
        except (ValueError, TypeError):
            return
        if not isinstance(obj, dict):
            return
        for k in sorted(obj):
            v = obj[k]
            yield k, int(v) if isinstance(v, (int, float)) and v == int(v) else None
