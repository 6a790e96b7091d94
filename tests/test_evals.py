"""Eval harness tests: metrics, task synthesis, results plumbing."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from cold_compress_tpu.evals.metric import AutoMetric
from cold_compress_tpu.evals.task import TASK_MAPPING, AutoTask


class TestMetrics:
    def test_rouge(self):
        m = AutoMetric.from_name("rouge")
        out = m.compute(
            None,
            ["the cat sat on the mat"],
            [["the cat sat on the mat"]],
        )
        assert out["rouge1"] == pytest.approx(1.0)
        assert out["rouge2"] == pytest.approx(1.0)
        assert out["rougeL"] == pytest.approx(1.0)
        out = m.compute(None, ["completely different words"], [["the cat sat"]])
        assert out["rouge1"] == 0.0

    def test_rouge_multi_reference_takes_max(self):
        m = AutoMetric.from_name("rouge")
        out = m.compute(
            None, ["alpha beta"], [["unrelated text", "alpha beta"]]
        )
        assert out["rouge1"] == pytest.approx(1.0)

    def test_accuracy(self):
        m = AutoMetric.from_name("accuracy")
        assert m.compute(None, ["A", "B", "C"], ["A", "B", "D"]) == pytest.approx(
            2 / 3
        )

    def test_exact_match(self):
        m = AutoMetric.from_name("exact_match")
        assert m.compute(None, ["foo  bar"], ["foo bar"]) == 1.0
        assert m.compute(None, ["foo baz"], ["foo bar"]) == 0.0

    def test_levenshtein_scale(self):
        m = AutoMetric.from_name("levenshtein")
        assert m.compute(None, ["hello"], ["hello"]) == pytest.approx(100.0)
        assert m.compute(None, ["abc"], ["xyz"]) == pytest.approx(0.0)

    def test_ruler_string_match(self):
        part = AutoMetric.from_name("ruler-string-match", match_part=True)
        full = AutoMetric.from_name("ruler-string-match", match_part=False)
        preds = ["the answers are X1 and X2"]
        refs = [["x1", "x2", "x3"]]
        assert part.compute(None, preds, refs)["score"] == 100.0
        assert full.compute(None, preds, refs)["score"] == pytest.approx(
            100 * 2 / 3, abs=0.01
        )

    def test_unknown_metric_raises(self):
        with pytest.raises(ValueError):
            AutoMetric.from_name("nope")


def word_tok(text):
    return text.split()


TASK_KW = dict(model_max_length=131072, tokenizer=word_tok, num_samples=4)


class TestRulerSynthesis:
    @pytest.mark.parametrize(
        "name", ["rulerniah", "rulervt", "rulercwe", "rulerqa"]
    )
    def test_synthesized_task_has_valid_rows(self, name):
        task = AutoTask.from_name(name, **TASK_KW)
        test = task.get_test()
        assert len(test) == 4  # num_samples subsampling applied
        for row in test:
            assert row["prompt"] and row["labels"]
            assert isinstance(row["labels"], list)

    def test_niah_answer_in_context(self):
        task = AutoTask.from_name("rulerniah", **TASK_KW)
        for row in task.get_test():
            assert row["labels"][0] in row["prompt"]

    def test_cwe_common_words_dominate(self):
        task = AutoTask.from_name("rulercwe", **TASK_KW)
        row = task.get_test()[0]
        body = row["context"].lower()
        for w in row["labels"]:
            assert body.count(f" {w}") >= 25

    def test_vt_chain_consistency(self):
        task = AutoTask.from_name("rulervt", **TASK_KW)
        row = task.get_test()[0]
        # Every labeled variable must appear in the context.
        for var in row["labels"]:
            assert var in row["prompt"]

    def test_perfect_prediction_scores_100(self):
        task = AutoTask.from_name("rulerniah", **TASK_KW)
        test = task.get_test()
        preds = [r["labels"][0] for r in test]
        out = task.test_metrics(preds)
        assert out["StringMatch"]["score"] == 100.0

    def test_subsampling_deterministic(self):
        t1 = AutoTask.from_name("rulerniah", **TASK_KW)
        t2 = AutoTask.from_name("rulerniah", **TASK_KW)
        assert [r["labels"] for r in t1.get_test()] == [
            r["labels"] for r in t2.get_test()
        ]

    def test_length_filtering(self):
        kw = dict(TASK_KW)
        kw["model_max_length"] = 50  # everything filtered
        task = AutoTask.from_name("rulerniah", **kw)
        assert task.get_test() == []


def test_task_registry_complete():
    # Reference parity: the 13-task zoo (reference: task.py:758-772), plus
    # the two offline local-corpus tasks (TPU-build addition: real metrics
    # from the trained TinyByteLM fixture without network access).
    assert set(TASK_MAPPING) == {
        "localtext",
        "localcode",
        "dolomites",
        "musique",
        "pg19",
        "qmsum",
        "repobench",
        "rulerqa",
        "rulerniah",
        "rulervt",
        "rulercwe",
        "scrollsquality",
        "squality",
        "triviaqa",
        "truthfulqa",
    }
    with pytest.raises(ValueError):
        AutoTask.from_name("bogus")
