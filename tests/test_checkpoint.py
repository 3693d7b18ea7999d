"""full_seq checkpoint/resume ledger."""

import json
import os

from dvs_mcemvs_tpu.checkpoint import RunCheckpoint, config_fingerprint


def test_mark_and_resume(tmp_path):
    p = str(tmp_path / "checkpoint.json")
    ck = RunCheckpoint(p, fingerprint="abc")
    assert not ck.is_done(0)
    ck.mark_done(0, ts=1.5)
    ck.mark_done(2, ts=3.5)
    # Fresh object resumes from disk.
    ck2 = RunCheckpoint(p, fingerprint="abc")
    assert ck2.is_done(0) and ck2.is_done(2) and not ck2.is_done(1)
    assert ck2.num_done == 2


def test_fingerprint_mismatch_ignores_ledger(tmp_path):
    p = str(tmp_path / "checkpoint.json")
    RunCheckpoint(p, fingerprint="old").mark_done(0)
    ck = RunCheckpoint(p, fingerprint="new")
    assert not ck.is_done(0)


def test_corrupt_ledger_starts_fresh(tmp_path):
    p = str(tmp_path / "checkpoint.json")
    with open(p, "w") as f:
        f.write("{not json")
    ck = RunCheckpoint(p, fingerprint="x")
    assert ck.num_done == 0
    ck.mark_done(1)
    assert json.load(open(p))["done"] == [1]


def test_disabled_writes_nothing(tmp_path):
    p = str(tmp_path / "checkpoint.json")
    ck = RunCheckpoint(p, enabled=False)
    ck.mark_done(0)
    assert not os.path.exists(p)


def test_fingerprint_ignores_output_knobs():
    a = "--dimZ=100\n--out_path=/a\n--save_dsi=true\n"
    b = "--dimZ=100\n--out_path=/b\n--save_dsi=false\n"
    c = "--dimZ=200\n--out_path=/a\n--save_dsi=true\n"
    assert config_fingerprint(a) == config_fingerprint(b)
    assert config_fingerprint(a) != config_fingerprint(c)


def test_resume_skips_compute(tmp_path):
    """Resuming a full_seq run must not recompute completed chunks: the
    skip predicate fires BEFORE process() (VERDICT r1 item 3)."""
    import numpy as np

    from dvs_mcemvs_tpu import pipeline
    from dvs_mcemvs_tpu.checkpoint import RunCheckpoint
    from dvs_mcemvs_tpu.mapper import Events

    ev = Events(
        x=np.zeros(300, np.int32), y=np.zeros(300, np.int32),
        t=np.linspace(0.0, 3.0, 300, dtype=np.float32))
    opts = pipeline.FullSeqOptions(start_time=0.0, stop_time=3.0,
                                   duration=1.0, out_skip=1.0)

    calls = []

    def fake_process(mappers, chunks, trajs, ts):
        calls.append(ts)
        return pipeline.ProcessResult(fused_dsi=None, T_rv_w=None, ts=ts)

    ckpt = RunCheckpoint(str(tmp_path / "ck.json"), fingerprint="f")
    # First run completes chunks 0 and 1, then "crashes".
    for k, ts, res in pipeline.run_full_seq(
            [], [ev], [], opts, fake_process, skip=ckpt.is_done):
        ckpt.mark_done(k, ts)
        if k == 1:
            break
    assert len(calls) == 2

    # Resume: only the remaining chunk is computed.
    calls.clear()
    ckpt2 = RunCheckpoint(str(tmp_path / "ck.json"), fingerprint="f")
    done = [k for k, _, _ in pipeline.run_full_seq(
        [], [ev], [], opts, fake_process, skip=ckpt2.is_done)]
    assert calls == [2.5] and done == [2]
