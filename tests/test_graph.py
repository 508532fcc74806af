"""Known-structure and degenerate-input tests for the graph-motif
operator (part_graph_triangles) — the oracle mirror covers real-data
parity; these pin the combinatorics on hand-built graphs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from advanced_data_profile_ray.pipelines.queries import q_part_graph_triangles


def _write_lineitem(tmp_path, orders_to_parts: dict[int, list[int]]):
    rows_o, rows_p = [], []
    for o, parts in orders_to_parts.items():
        for p in parts:
            rows_o.append(o)
            rows_p.append(p)
    t = pa.table({"l_orderkey": pa.array(rows_o, pa.int64()),
                  "l_partkey": pa.array(rows_p, pa.int64())})
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_known_triangle_with_pendant(ray_session, tmp_path):
    # support-2 edges: (1,2) (1,3) (2,3) (1,4) -> one triangle, one
    # pendant; degrees 3/2/2/1 -> wedges 3+1+1+0 = 5; clustering 3/5
    orders = {
        1: [1, 2], 2: [1, 2],
        3: [1, 3], 4: [1, 3],
        5: [2, 3], 6: [2, 3],
        7: [1, 4], 8: [1, 4],
    }
    out = q_part_graph_triangles(_write_lineitem(tmp_path, orders))
    assert out.iloc[0]["n_edges"] == 4
    assert out.iloc[0]["n_wedges"] == 5
    assert out.iloc[0]["n_triangles"] == 1
    assert out.iloc[0]["clustering"] == pytest.approx(0.6)


def test_support_pruning_drops_chance_pairs(ray_session, tmp_path):
    # every pair co-occurs exactly once -> support-2 graph is empty
    orders = {1: [1, 2], 2: [3, 4], 3: [1, 3]}
    out = q_part_graph_triangles(_write_lineitem(tmp_path, orders))
    assert out.iloc[0]["n_edges"] == 0
    assert out.iloc[0]["n_wedges"] == 0
    assert out.iloc[0]["n_triangles"] == 0
    assert np.isnan(out.iloc[0]["clustering"])


def test_triangle_counted_once_per_smallest_vertex(ray_session, tmp_path):
    # K4 at support 2: 6 edges, C(3,2)*4 = 12 wedges, 4 triangles,
    # clustering = 12/12 = 1.0 — each triangle counted exactly once
    parts = [1, 2, 3, 4]
    orders = {}
    oid = 1
    for i in range(4):
        for j in range(i + 1, 4):
            for _ in range(2):
                orders[oid] = [parts[i], parts[j]]
                oid += 1
    out = q_part_graph_triangles(_write_lineitem(tmp_path, orders))
    assert out.iloc[0]["n_edges"] == 6
    assert out.iloc[0]["n_wedges"] == 12
    assert out.iloc[0]["n_triangles"] == 4
    assert out.iloc[0]["clustering"] == pytest.approx(1.0)


def test_wide_key_space_no_phantom_triangle(ray_session, tmp_path):
    # regression: a packed v*2^32+w closure key would alias wedge (11,20)
    # with edge (10, 2^32+20) and inflate the count with a phantom
    # triangle; the multi-key (v, w) exchange must count exactly the
    # three real ones
    big = (1 << 32) + 20
    orders = {}
    oid = 1
    for u, v in [(1, 10), (1, 11), (10, 11), (10, 20), (11, 20),
                 (10, big), (1, big)]:
        for _ in range(2):
            orders[oid] = [u, v]
            oid += 1
    out = q_part_graph_triangles(_write_lineitem(tmp_path, orders))
    # triangles here: (1,10,11), (10,11,20), (1,10,big) — all real;
    # crucially NOT (10,11,big)-style phantoms from key aliasing
    assert out.iloc[0]["n_edges"] == 7
    assert out.iloc[0]["n_triangles"] == 3
