"""Pins the 40x blocking-sweep artifact (tools/scale_sweep.py blocking):
the dedup family's 100 TB argument is that candidates PER DOC stay flat
because blocking width scales with the corpus. The sweep measures it at
1/4/10/40x sf0.1 with non-near-dup replication; this test asserts the
recorded rates whenever the artifact exists (regenerate with
`python tools/scale_sweep.py blocking`)."""

from __future__ import annotations

import json
import os

import pytest

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BLOCKING_SWEEP.json")


@pytest.fixture(scope="module")
def sweep():
    if not os.path.exists(ARTIFACT):
        pytest.skip("blocking sweep artifact not generated on this machine")
    with open(ARTIFACT) as f:
        return json.load(f)


def test_shingle_candidate_rate_flat_at_40x(sweep):
    s = sweep["scales"]
    assert s["x40"]["n_docs"] == 40 * s["x1"]["n_docs"]
    assert (
        s["x40"]["shingle_cand_per_doc"] <= 1.15 * s["x1"]["shingle_cand_per_doc"]
    ), "shingle-posting candidates per doc grew at 40x"


def test_embedding_candidate_rate_flat_as_bits_step(sweep):
    s = sweep["scales"]
    # the bit width actually stepped across the sweep (the mechanism under test)
    assert s["x40"]["chunk_bits"] > s["x1"]["chunk_bits"]
    assert s["x40"]["emb_cand_per_vec"] <= 1.15 * max(
        s["x1"]["emb_cand_per_vec"], s["x10"]["emb_cand_per_vec"]
    ), "per-vector candidate rate grew at 40x despite bit stepping"


def test_frozen_bits_contrast_shows_scaling_is_load_bearing(sweep):
    s = sweep["scales"]
    assert (
        s["x40"]["emb_cand_per_vec_frozen_bits"] >= 4 * s["x40"]["emb_cand_per_vec"]
    ), "freezing bits at the 1x width should blow up occupancy at 40x"


def test_substring_dup_start_rate_flat_at_40x(sweep):
    s = sweep["scales"]
    if "substr_dup_starts_per_doc" not in s["x1"]:
        pytest.skip("artifact predates the substring-family sweep")
    assert (
        s["x40"]["substr_dup_starts_per_doc"]
        <= 1.15 * s["x1"]["substr_dup_starts_per_doc"]
    ), "duplicated-L-gram starts per doc grew at 40x"
