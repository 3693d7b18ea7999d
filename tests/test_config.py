import textwrap

import pytest

from dvs_mcemvs_tpu.config import RunConfig, parse_args, parse_flagfile, config_to_flagfile


DSEC_CONF = textwrap.dedent("""\
    --bag_filename_left=/data/left.bag
    --bag_filename_right=/data/right.bag
    --bag_filename_pose=/data/pose.bag
    --out_path=
    --calib_type=dsec_yaml
    --calib_path=/data/cam_to_cam.yaml
    --mocap_calib_path=/data/cam_to_lidar.yaml
    --event_topic0=/dvs/left/events
    --event_topic1=/dvs/right/events
    --pose_topic=/pose
    --min_depth=4
    --max_depth=200
    --start_time_s=10
    --stop_time_s=35
    --duration=0.2
    --out_skip=1
    --dimZ=100
    --process_method=1
    --stereo_fusion=2
    --adaptive_threshold_c=4
    --max_confidence=0
    --forward_looking=true
    --full_seq=true
""")


def test_parse_reference_flagfile(tmp_path):
    p = tmp_path / "dsec.conf"
    p.write_text(DSEC_CONF)
    cfg = parse_flagfile(str(p))
    assert cfg.calib_type == "dsec_yaml"
    assert cfg.min_depth == 4.0 and cfg.max_depth == 200.0
    assert cfg.start_time_s == 10.0 and cfg.stop_time_s == 35.0
    assert cfg.duration == 0.2 and cfg.out_skip == 1.0
    assert cfg.dimZ == 100 and cfg.process_method == 1
    assert cfg.forward_looking is True and cfg.full_seq is True
    assert cfg.adaptive_threshold_c == 4.0


def test_parse_args_forms():
    cfg = parse_args(["--dimZ=64", "--min_depth", "1.5", "--full_seq",
                      "--nosave_mono", "--ts=0.7"])
    assert cfg.dimZ == 64 and cfg.min_depth == 1.5
    assert cfg.full_seq is True and cfg.save_mono is False
    assert cfg.ts == 0.7


def test_ts_defaults_to_midpoint():
    cfg = parse_args(["--start_time_s=2", "--stop_time_s=8"])
    assert cfg.ts is None
    assert cfg.resolved_ts() == 5.0
    cfg2 = parse_args(["--start_time_s=2", "--stop_time_s=8", "--ts=3"])
    assert cfg2.resolved_ts() == 3.0


def test_unknown_flag_raises():
    with pytest.raises(KeyError):
        parse_args(["--not_a_flag=1"])


def test_nested_flagfile(tmp_path):
    inner = tmp_path / "inner.conf"
    inner.write_text("--dimZ=42\n")
    outer = tmp_path / "outer.conf"
    outer.write_text(f"--flagfile={inner}\n--min_depth=2\n")
    cfg = parse_flagfile(str(outer))
    assert cfg.dimZ == 42 and cfg.min_depth == 2.0


def test_roundtrip_serialization(tmp_path):
    cfg = parse_args(["--dimZ=77", "--stereo_fusion=5", "--forward_looking"])
    p = tmp_path / "roundtrip.conf"
    p.write_text(config_to_flagfile(cfg))
    cfg2 = parse_flagfile(str(p))
    assert cfg2.dimZ == 77 and cfg2.stereo_fusion == 5
    assert cfg2.forward_looking is True
