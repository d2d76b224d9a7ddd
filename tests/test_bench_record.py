"""Unit tests for bench.compose_record — the one-line bench JSON contract.

The driver parses exactly one JSON line per bench run; ``value`` must be
the fastest serving configuration measured in THAT bench (the int8 W8A8
line when it beats bf16), with the parity-exact bf16 number always
reported alongside, and any int8 failure (error string, missing line)
falling back to bf16.  These tests pin that selection logic down without
touching a device.
"""

import json

import bench


def _record(**kw):
    defaults = dict(img_per_s=5019.0, train_rate=1116.0,
                    train_rate_512=1118.0, families={}, pipe=None)
    defaults.update(kw)
    return bench.compose_record(**defaults)


def test_int8_faster_becomes_primary_value():
    rec = _record(families={"extract_int8_vitb16_img_per_s": 6600.0})
    assert rec["value"] == 6600.0
    assert "int8" in rec["serving_config"]
    # the parity-exact bf16 number rides alongside, with its roofline
    assert rec["extract_bf16_img_per_s"] == 5019.0
    assert 0 < rec["bf16_roofline_fraction"] < 1
    assert rec["vs_baseline"] == round(6600.0 / bench.BASELINE_IMG_PER_S, 4)


def test_int8_slower_falls_back_to_bf16():
    rec = _record(families={"extract_int8_vitb16_img_per_s": 4000.0})
    assert rec["value"] == 5019.0
    assert "bf16" in rec["serving_config"]


def test_int8_error_string_falls_back_to_bf16():
    # a stalled/failed family subprocess reports an error string, not a
    # float — it must never be selected as the headline
    rec = _record(families={"extract_int8_vitb16_img_per_s":
                            "error: subprocess timeout"})
    assert rec["value"] == 5019.0
    assert rec["vs_baseline"] == round(5019.0 / bench.BASELINE_IMG_PER_S, 4)


def test_int8_missing_falls_back_to_bf16():
    rec = _record(families={})
    assert rec["value"] == 5019.0


def test_pipe_merged_and_json_serializable():
    pipe = {"pipeline_img_per_s": 176.1,
            "pipeline_host_decode_img_per_s": 442.9}
    rec = _record(pipe=pipe)
    assert rec["pipeline_img_per_s"] == 176.1
    assert "pipeline_note" in rec
    # the driver contract: the record is one parseable JSON object
    assert json.loads(json.dumps(rec))["metric"] == \
        "clip_vitb16_feature_extraction_throughput"


def test_no_pipe_no_pipeline_note():
    rec = _record(pipe=None)
    assert "pipeline_note" not in rec
    assert "pipeline_img_per_s" not in rec


class _FakeCompleted:
    def __init__(self, rc, stdout, stderr=""):
        self.returncode, self.stdout, self.stderr = rc, stdout, stderr


def _patch_family_runs(monkeypatch, outcomes, calls):
    """outcomes: key -> list of per-attempt results ('ok:<val>' or 'fail');
    records the attempt order in ``calls``."""
    import subprocess

    def fake_run(cmd, env=None, **kw):
        key = env["UML_BENCH_FAMILY"]
        calls.append(key)
        plan = outcomes.get(key, ["ok:100.0"])
        step = plan.pop(0) if len(plan) > 1 else plan[0]
        if step == "fail":
            return _FakeCompleted(1, "", "boom")
        return _FakeCompleted(0, step.split(":")[1] + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)


def test_family_survey_line_retried_from_leftover_budget(monkeypatch):
    calls = []
    _patch_family_runs(
        monkeypatch,
        {"extract_dinov2_vitl14_img_per_s": ["fail", "ok:958.0"]}, calls)
    out = bench.family_bench()
    assert out["extract_dinov2_vitl14_img_per_s"] == 958.0
    # the retry happens AFTER every key's first attempt (second pass)
    first_attempts = calls[: len(bench.FAMILY_BUILDERS)]
    assert sorted(first_attempts) == sorted(bench.FAMILY_BUILDERS)
    assert calls[-1] == "extract_dinov2_vitl14_img_per_s"


def test_family_headline_retried_immediately(monkeypatch):
    calls = []
    _patch_family_runs(
        monkeypatch,
        {"extract_int8_vitb16_img_per_s": ["fail", "ok:6600.0"]}, calls)
    out = bench.family_bench()
    assert out["extract_int8_vitb16_img_per_s"] == 6600.0
    # the headline candidate's retry precedes the survey lines' first run
    assert calls[0] == calls[1] == "extract_int8_vitb16_img_per_s"


def test_family_persistent_failure_keeps_error_string(monkeypatch):
    calls = []
    _patch_family_runs(
        monkeypatch, {"extract_clip_rn50_img_per_s": ["fail", "fail"]},
        calls)
    out = bench.family_bench()
    assert isinstance(out["extract_clip_rn50_img_per_s"], str)
    assert out["extract_clip_rn50_img_per_s"].startswith("error")


def test_text_family_keys_and_token_staging():
    # the text-tower lines dispatch token staging instead of image bytes;
    # every TEXT_FAMILIES key must exist in the builder registry
    for k in bench.TEXT_FAMILIES:
        assert k in bench.FAMILY_BUILDERS
    import numpy as np
    toks = np.asarray(bench.stage_tokens(4))
    assert toks.shape == (4, 77) and toks.dtype == np.int32
    # EOT id (the vocab max) forced into the last column: argmax pooling
    # gathers the end position, like real tokenized prompts
    assert (toks.argmax(axis=-1) == 76).all()
    assert toks.min() >= 1 and toks.max() == 49407


def test_family_lines_pass_through():
    fams = {"extract_dinov2_vitb14_img_per_s": 3341.0,
            "extract_clip_rn50_img_per_s": 8546.8}
    rec = _record(families=dict(fams))
    for k, v in fams.items():
        assert rec[k] == v
