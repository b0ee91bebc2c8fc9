"""Kernel introspection (`SearchEngine.profile` / plans.query.profile_query).

The profile run executes the REAL pruned kernel with the profile flag —
same closure, same control flow — so these tests pin the invariants the
tuning loop relies on: every (shard, term) hit appears exactly once, block
counts are consistent, the seed term is the heaviest, and running a profile
never perturbs search results."""

from __future__ import annotations

import math

import numpy as np


def _stats(eng, text, k=10):
    decision, sdf = eng.profile(text, k=k)
    return decision, sdf.toPandas()


class TestProfile:
    def test_decision_replays_adaptive_choice(self, built_index):
        # "def" is a hot term in the generated corpus: candidate pool
        # dwarfs k -> pruned; a unique-hit term -> exhaustive.
        dec_hot, _ = _stats(built_index, "def license")
        assert dec_hot["kernel"] == "pruned"
        assert dec_hot["n_candidates"] > dec_hot["threshold"]
        assert set(dec_hot["terms"]) == {"def", "license"}
        dec_rare, _ = _stats(built_index, "uid7doc")
        assert dec_rare["kernel"] == "exhaustive"

    def test_rows_cover_each_shard_term_once(self, built_index):
        _, pdf = _stats(built_index, "def license return")
        assert len(pdf)
        assert not pdf.duplicated(["gen", "shard", "term"]).any()
        # per shard: exactly one seed, and it carries the max weight
        for _, g in pdf.groupby(["gen", "shard"]):
            seeds = g[g.decode_mode == "seed"]
            assert len(seeds) == 1
            assert seeds.weight.iloc[0] >= g.weight.max() - 1e-12
            assert math.isnan(seeds.theta.iloc[0])

    def test_block_counts_consistent(self, built_index):
        _, pdf = _stats(built_index, "def license return import", k=3)
        assert (pdf.blocks_decoded <= pdf.n_blocks).all()
        assert (pdf.n_blocks > 0).all()
        sel = pdf[pdf.decode_mode == "selective"]
        # selective rows are the ones where skipping fired
        assert (sel.blocks_decoded <= 0.5 * sel.n_blocks + 1).all()
        full = pdf[pdf.decode_mode.isin(["seed", "full"])]
        assert (full.blocks_decoded == full.n_blocks).all()
        # theta rows (non-seed) carry a finite lower bound or -inf
        non_seed = pdf[pdf.decode_mode != "seed"]
        assert non_seed.theta.notna().all()

    def test_profile_does_not_perturb_search(self, built_index):
        before = built_index.search_topk_rows("def license", 10)
        _stats(built_index, "def license")
        after = built_index.search_topk_rows("def license", 10)
        assert before == after

    def test_empty_and_nohit_queries(self, built_index):
        dec, pdf = _stats(built_index, "")
        assert dec["kernel"] is None and pdf.empty
        dec, pdf = _stats(built_index, "zzznohit qqqmissing")
        assert pdf.empty

    def test_df_column_matches_global_stats(self, built_index):
        dec, pdf = _stats(built_index, "def license")
        got = pdf.groupby("term")["df"].first().to_dict()
        for t, df in got.items():
            assert df == dec["terms"][t]
        # weights are qtf * idf with the global df (spot-check shape)
        assert (pdf.weight > 0).all()
        assert np.isfinite(pdf.weight).all()
