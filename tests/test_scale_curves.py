"""scale_curves.py synthetic-replica generator invariants: the scale
measurement is only meaningful if replicas are id-disjoint (no artificial
exact dups), parity-preserving (incremental_dedup's even/odd split), and
token-salted so replicas do not near-duplicate each other."""

from __future__ import annotations

import duckdb

import scale_curves as SC


def test_synthetic_replicas_disjoint_salted(tmp_path):
    out = str(tmp_path / "synth")
    SC.build_synthetic("/root/testdata/sf0.001", out, replicas=2)
    con = duckdb.connect()
    base_n, = con.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()
    n, ids, mn, mx = con.sql(
        f"SELECT count(*), count(DISTINCT doc_id), min(doc_id), max(doc_id) "
        f"FROM '{out}/documents.parquet'"
    ).fetchone()
    assert n == 2 * base_n and ids == n
    assert mx >= SC.ID_STRIDE > mn
    # parity preserved: replica k of doc d has the same doc_id parity
    odd0, = con.sql(
        f"SELECT count(*) FROM '{out}/documents.parquet' "
        f"WHERE doc_id < {SC.ID_STRIDE} AND doc_id % 2 = 1"
    ).fetchone()
    odd1, = con.sql(
        f"SELECT count(*) FROM '{out}/documents.parquet' "
        f"WHERE doc_id >= {SC.ID_STRIDE} AND doc_id % 2 = 1"
    ).fetchone()
    assert odd0 == odd1
    # replica text is token-salted: zero shared tokens with replica 0
    shared, = con.sql(f"""
        SELECT count(*) FROM (
          SELECT DISTINCT unnest(string_split(text, ' ')) AS t
          FROM '{out}/documents.parquet' WHERE doc_id >= {SC.ID_STRIDE}
        ) a JOIN (
          SELECT DISTINCT unnest(string_split(text, ' ')) AS t
          FROM '{out}/documents.parquet'
          WHERE doc_id < {SC.ID_STRIDE} AND text IS NOT NULL
        ) b USING (t)
        WHERE a.t != ''
    """).fetchone()
    assert shared == 0
    # replica embeddings are shifted on dim 1 only
    bad, = con.sql(f"""
        SELECT count(*) FROM '{out}/embeddings.parquet' e1
        JOIN '{out}/embeddings.parquet' e0
          ON e1.vec_id = e0.vec_id + {SC.ID_STRIDE}
        WHERE abs(e1.embedding[1] - e0.embedding[1] - 100.0) > 1e-4
           OR e1.embedding[2] != e0.embedding[2]
    """).fetchone()
    assert bad == 0
