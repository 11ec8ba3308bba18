"""The examples/tour.py front door runs end-to-end (reference parity:
the kafi repo ships demo.ipynb / multiple_sinks.ipynb as its demo
surface; ours is executable in CI so it can never rot)."""

from __future__ import annotations


def test_tour_runs_end_to_end(spark, tmp_path):
    import examples.tour as tour

    out = tour.main(spark=spark, workdir=str(tmp_path), show=False)
    # every section produced rows
    assert all(n > 0 for n in out.values()), out
    # the fan-out stream fed both sinks and agrees with the batch graph
    assert out["topology_stream_sink2"] > 0
    assert out["topics"] == 500  # sf0.001 documents
    assert out["curated"] <= 500
