"""Kill-and-resume test (SURVEY.md §5.5): fail mid-run, rerun, assert
identical final output and conserved metrics with no double counting."""

from __future__ import annotations

import os

import pytest

from wtq.checkpoint import (
    InjectedFailure,
    committed_chunks,
    read_decided,
    read_metrics,
    run_checkpointed,
)
from wtq.pipeline import run_pipeline

N_CHUNKS = 4


def test_kill_and_resume(spark, pages_path, tmp_path):
    out = str(tmp_path / "ckpt")

    # first run dies after chunk 1
    with pytest.raises(InjectedFailure):
        run_checkpointed(spark, pages_path, out, n_chunks=N_CHUNKS, fail_after_chunk=1)
    assert committed_chunks(out, N_CHUNKS) == [0, 1]
    mtimes = {
        k: os.path.getmtime(os.path.join(out, f"chunk={k}", "_WTQ_COMMITTED"))
        for k in (0, 1)
    }

    # resume: only the remaining chunks run
    done = run_checkpointed(spark, pages_path, out, n_chunks=N_CHUNKS)
    assert done == [2, 3]
    assert committed_chunks(out, N_CHUNKS) == [0, 1, 2, 3]
    for k, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f"chunk={k}", "_WTQ_COMMITTED")) == m

    # final output identical to a single-shot run
    got = (
        read_decided(spark, out)
        .select("url", "keep", "fired_rules")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    ref = (
        run_pipeline(spark, pages_path)
        .decided.select("url", "keep", "fired_rules")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got.url.tolist() == ref.url.tolist()
    assert got.keep.tolist() == ref.keep.tolist()
    assert [list(a) for a in got.fired_rules] == [list(a) for a in ref.fired_rules]

    # metrics conserved across chunks — no double counting
    m = read_metrics(spark, out).toPandas()
    assert int(m.n_input.sum()) == len(ref)
    assert int(m.n_keep.sum()) == int(ref.keep.sum())

    # second resume is a no-op
    assert run_checkpointed(spark, pages_path, out, n_chunks=N_CHUNKS) == []
