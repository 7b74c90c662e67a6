"""Operator library: relational, joins, aggregations, windows, dedup,
similarity, text, multimodal — each module documents the SURVEY §2 rows it
implements and the scale posture (shuffle/broadcast/pushdown) of each op."""
