"""Unit tests for bench.py's orchestration layer — the one-line JSON
contract, the streaming-child parser, the budget/shed logic, and the
headline selection.

The driver parses exactly one JSON line per bench run; ``value`` must be
the fastest serving configuration measured in THAT bench (the int8 W8A8
line when it beats bf16), with the parity-exact bf16 number always
reported alongside, and any int8 failure (missing line) falling back to
bf16.  Children stream each metric as its own JSON line so a timeout
kill costs only the un-emitted lines.  These tests pin that down without
touching a device.
"""

import json
import subprocess

import bench


def _record(metrics=None, shed=()):
    base = {"extract_bf16_img_per_s": 5019.0,
            "train_full_finetune_img_per_s": 1116.0}
    base.update(metrics or {})
    return bench.compose_record(base, shed)


def test_int8_faster_becomes_primary_value():
    rec = _record({"extract_int8_vitb16_img_per_s": 6600.0})
    assert rec["value"] == 6600.0
    assert "int8" in rec["serving_config"]
    # the parity-exact bf16 number rides alongside, with its roofline
    assert rec["extract_bf16_img_per_s"] == 5019.0
    assert 0 < rec["bf16_roofline_fraction"] < 1.1
    assert rec["vs_baseline"] == round(6600.0 / bench.BASELINE_IMG_PER_S, 4)


def test_int8_slower_falls_back_to_bf16():
    rec = _record({"extract_int8_vitb16_img_per_s": 4000.0})
    assert rec["value"] == 5019.0
    assert "bf16" in rec["serving_config"]


def test_int8_missing_falls_back_to_bf16():
    rec = _record()
    assert rec["value"] == 5019.0
    assert "bf16" in rec["serving_config"]


def test_bf16_missing_int8_carries_the_headline():
    # a core-child stall must not zero the record when the int8 serving
    # line (its own child) still measured
    rec = bench.compose_record({"extract_int8_vitb16_img_per_s": 6600.0},
                               ["extract_bf16_img_per_s"])
    assert rec["value"] == 6600.0
    assert "extract_bf16_img_per_s" in rec["shed"]


def test_nothing_measured_yields_explicit_error_record():
    rec = bench.compose_record({}, list(bench.CORE_KEYS))
    assert rec["value"] == 0.0
    assert rec["serving_config"].startswith("error")
    assert json.loads(json.dumps(rec))["vs_baseline"] == 0.0


def test_pipeline_keys_merged_and_note_added():
    rec = _record({"pipeline_img_per_s": 176.1,
                   "pipeline_vs_link_bound": 0.91})
    assert rec["pipeline_img_per_s"] == 176.1
    assert "pipeline_note" in rec
    # the driver contract: the record is one parseable JSON object
    assert json.loads(json.dumps(rec))["metric"] == \
        "clip_vitb16_feature_extraction_throughput"


def test_no_pipeline_no_note():
    rec = _record()
    assert "pipeline_note" not in rec
    assert "pipeline_img_per_s" not in rec


def test_shed_listed_sorted_and_elapsed_present():
    rec = _record(shed=["b_metric", "a_metric"])
    assert rec["shed"] == ["a_metric", "b_metric"]
    assert "elapsed_s" in rec


def test_parse_stream_merges_json_lines_and_ignores_noise():
    text = ("WARNING: platform axon is experimental\n"
            '{"extract_bf16_img_per_s": 5019.0}\n'
            "some stray line { not json\n"
            '{"train_full_finetune_img_per_s": 1116.0, "extra": 1}\n')
    out = bench._parse_stream(text)
    assert out == {"extract_bf16_img_per_s": 5019.0,
                   "train_full_finetune_img_per_s": 1116.0, "extra": 1}


def test_parse_stream_handles_none_and_empty():
    assert bench._parse_stream(None) == {}
    assert bench._parse_stream("") == {}


import io


class _FakePopen:
    """Stands in for subprocess.Popen in run_child: emits the planned
    stdout instantly and exits 0 (or never exits, for stall tests)."""

    def __init__(self, stdout_text, rc=0, hang=False):
        self.stdout = io.StringIO(stdout_text)
        self.stderr = io.StringIO("")
        self.returncode = rc
        self._hang = hang
        self.killed = False

    def poll(self):
        return None if (self._hang and not self.killed) else self.returncode

    def kill(self):
        self.killed = True
        self.returncode = -9

    def wait(self):
        return self.returncode


def _patch_children(monkeypatch, outcomes, calls):
    """outcomes: group-key-string -> list of per-attempt stdouts; records
    the attempt order (the UML_BENCH_FAMILY env value) in ``calls``."""
    def fake_popen(cmd, env=None, **kw):
        key = env["UML_BENCH_FAMILY"]
        calls.append(key)
        plan = outcomes.get(key, ["{}"])
        step = plan.pop(0) if len(plan) > 1 else plan[0]
        return _FakePopen(step)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)


def test_family_followup_runs_missing_keys(monkeypatch):
    calls = []
    missing = ["extract_clip_vitl14_img_per_s",
               "extract_dinov2_vitl14_img_per_s"]
    _patch_children(
        monkeypatch,
        {",".join(missing):
         [json.dumps({missing[0]: 958.0})]}, calls)
    metrics = bench.family_followup(missing, deadline_fn=lambda: 1000.0)
    assert metrics[missing[0]] == 958.0
    assert calls == [",".join(missing)]


def test_family_followup_skipped_when_budget_below_handshake(monkeypatch):
    # a follow-up child pays the ~200-230 s per-process relay handshake
    # before its first measurement: launching one into a <300 s window
    # would burn the rest of the budget for nothing
    calls = []
    _patch_children(monkeypatch, {}, calls)
    missing = ["extract_text_bf16_sent_per_s"]
    metrics = bench.family_followup(missing, deadline_fn=lambda: 250.0)
    assert metrics == {}
    assert calls == []  # never launched


def test_family_followup_noop_when_nothing_missing(monkeypatch):
    calls = []
    _patch_children(monkeypatch, {}, calls)
    assert bench.family_followup([], deadline_fn=lambda: 1000.0) == {}
    assert calls == []


def test_roofline_fractions_emitted_per_family():
    """Every measured family line gets a machine-checkable
    <key>_roofline_fraction against its analytic SoL (FAMILY_SOL), so
    the per-family >=84% criterion is verifiable from the bench JSON
    alone.  Unmeasured keys get no fraction; RN50 (no analytic row)
    never does."""
    rec = _record({"extract_int8_vitb16_img_per_s": 6600.0,
                   "extract_dinov2_vitb14_img_per_s": 3650.0,
                   "extract_text_bf16_sent_per_s": 22000.0,
                   "extract_clip_rn50_img_per_s": 8400.0})
    assert rec["extract_bf16_img_per_s_roofline_fraction"] == round(
        5019.0 / bench.FAMILY_SOL["extract_bf16_img_per_s"], 3)
    assert rec["extract_int8_vitb16_img_per_s_roofline_fraction"] == round(
        6600.0 / 8511.5, 3)
    assert rec["extract_dinov2_vitb14_img_per_s_roofline_fraction"] == round(
        3650.0 / 4337.3, 3)
    assert rec["extract_text_bf16_sent_per_s_roofline_fraction"] == round(
        22000.0 / 32267.3, 3)
    assert "extract_clip_rn50_img_per_s_roofline_fraction" not in rec
    assert "extract_dino_vitb8_img_per_s_roofline_fraction" not in rec


def test_family_sol_matches_analytic_table():
    """FAMILY_SOL's hardcoded constants == tools/roofline_families.py's
    analytic rows (the derivation), so the bench JSON can't silently
    drift from the accounting."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "roofline_families",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "roofline_families.py"))
    rf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rf)
    key_for = {
        ("clip", "ViT-B/16"): "extract_bf16_img_per_s",
        ("clip_q8", "ViT-B/16"): "extract_int8_vitb16_img_per_s",
        ("clip", "ViT-L/14"): "extract_clip_vitl14_img_per_s",
        ("text", "ViT-B/16"): "extract_text_bf16_sent_per_s",
        ("text_q8", "ViT-B/16"): "extract_text_int8_sent_per_s",
        ("dino", "vit_base_patch14_dinov2.lvd142m"):
            "extract_dinov2_vitb14_img_per_s",
        ("dino", "vit_large_patch14_dinov2.lvd142m"):
            "extract_dinov2_vitl14_img_per_s",
        ("dino", "vit_base_patch8_224_dino"):
            "extract_dino_vitb8_img_per_s",
    }
    seen = set()
    for label, shape, ident in rf.families():
        shape = dict(shape)
        is_text = shape.pop("text", False)
        int8 = shape.pop("int8", False)
        if int8:
            sol = (rf.text_int8_sol if is_text else rf.vit_int8_sol)(**shape)
        else:
            gf = (rf.text_gflop_per_sent if is_text
                  else rf.vit_gflop_per_img)(**shape)
            sol = rf.PEAK_TFS * 1e3 / gf
        key = key_for[ident]
        assert abs(bench.FAMILY_SOL[key] - sol) < 0.1, (key, sol)
        seen.add(key)
    assert seen == set(bench.FAMILY_SOL)


def test_family_keys_cover_all_builders():
    assert sorted(bench.ALL_FAMILY_KEYS) == sorted(bench.FAMILY_BUILDERS)
    # the serving-headline candidate leads (measured right after bf16,
    # before the survey, inside the one full core child)
    assert bench.ALL_FAMILY_KEYS[0] == "extract_int8_vitb16_img_per_s"


def test_text_family_keys_in_builders():
    for k in bench.TEXT_FAMILIES:
        assert k in bench.FAMILY_BUILDERS


def test_family_lines_pass_through():
    fams = {"extract_dinov2_vitb14_img_per_s": 3341.0,
            "extract_clip_rn50_img_per_s": 8546.8}
    rec = _record(dict(fams))
    for k, v in fams.items():
        assert rec[k] == v


def test_run_child_no_first_light_kills_and_reports(monkeypatch):
    """A child that streams nothing past the first-light window is
    killed with status no-first-light (the per-process relay stall) —
    the parent can then relaunch into a fresh process."""
    from tests.test_bench_record import _FakePopen  # self-import ok

    hung = _FakePopen("", hang=True)
    monkeypatch.setattr(subprocess, "Popen", lambda *a, **kw: hung)
    metrics, status = bench.run_child({"UML_BENCH_CORE": "1"},
                                      timeout_s=30.0, first_light_s=0.6)
    assert status == "no-first-light"
    assert hung.killed
    assert metrics == {}


def test_run_child_streamed_lines_survive_ok_exit(monkeypatch):
    out = ('{"extract_bf16_img_per_s": 5016.5}\n'
           "noise\n"
           '{"train_full_finetune_img_per_s": 1291.9}\n')
    monkeypatch.setattr(subprocess, "Popen",
                        lambda *a, **kw: _FakePopen(out))
    metrics, status = bench.run_child({"UML_BENCH_CORE": "1"},
                                      timeout_s=30.0, first_light_s=5.0)
    assert status == "ok"
    assert metrics == {"extract_bf16_img_per_s": 5016.5,
                       "train_full_finetune_img_per_s": 1291.9}


def test_train_marginal_two_point_fit():
    # r5 probe numbers: bs128 1286.3, bs512 1385.7 img/s ->
    # c = (512/1385.7 - 128/1286.3)/384, marginal = 1/c ~ 1422 img/s
    m = bench.train_marginal(1286.3, 1385.7)
    assert 1350 < m["train_full_finetune_marginal_img_per_s"] < 1500
    assert 5 < m["train_step_fixed_overhead_ms"] < 15
    # degenerate pair (bs512 faster in absolute step time): no emission
    assert bench.train_marginal(1000.0, 5000.0) == {}
