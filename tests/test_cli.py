"""CLI flag surface: the reference bear.sh recipes must parse."""

import pytest

from customnerf_tpu.config import parse_args


def test_bear_reconstruction_flags_parse():
    opt = parse_args([
        "-O2", "--data_type", "nerfstudio", "--data_path", "/data/bear",
        "--keyword", "lang_bear", "--workspace", "outputs/bear_recon",
        "--iters", "3000", "--train_resolution_level", "7",
        "--eval_resolution_level", "4", "--bound", "2",
        "--train_conf", "0.01", "--soft_mask", "--ckpt", "scratch",
    ])
    assert opt.fp16 and not opt.cuda_ray        # -O2 macro
    assert opt.train_resolution_level == 7
    assert opt.soft_mask and opt.train_conf == 0.01


def test_bear_editing_flags_parse():
    opt = parse_args([
        "-O2", "--data_type", "nerfstudio", "--data_path", "/data/bear",
        "--keyword", "lang_bear", "--workspace", "outputs/bear_edit",
        "--iters", "10000", "--pretrained",
        "--editing_from", "outputs/bear_recon/checkpoints/df_ep0030.pth",
        "--text", "a corgi in a forest", "--text_fg", "a corgi",
        "--lambda_sd", "0.01", "--keep_bg", "1000", "--cfg", "100",
        "--random_bg_c", "--detach_bg", "--clip_view", "--stage_time",
        "--sd_version", "1.5", "--train_conf", "0.01", "--soft_mask",
    ])
    assert opt.pretrained and opt.stage_time and opt.clip_view
    assert opt.keep_bg == 1000 and opt.cfg == 100
    assert opt.text == "a corgi in a forest"


def test_o_macro_and_lists():
    opt = parse_args(["-O", "--dis_scale", "1", "2", "3",
                      "--video_inter_idxs", "0", "5", "9"])
    assert opt.fp16 and opt.cuda_ray
    assert opt.dis_scale == [1.0, 2.0, 3.0]
    assert opt.video_inter_idxs == [0, 5, 9]


def test_store_false_flag():
    # reference exposes train_all_pixel as store_false
    assert parse_args([]).train_all_pixel is True
    assert parse_args(["--train_all_pixel"]).train_all_pixel is False


def test_use_cd_and_tpu_extensions():
    opt = parse_args(["--use_cd", "/path/to/cd", "--backend", "pallas",
                      "--mesh_shape", "data:8", "--steps_per_dispatch", "4",
                      "--occ_grid_size", "64"])
    assert opt.use_cd == "/path/to/cd"
    assert opt.backend == "pallas"
    assert opt.mesh_shape == "data:8"


def test_invalid_backend_rejected():
    with pytest.raises((ValueError, SystemExit)):
        parse_args(["--backend", "cuda"])


def test_bear_tpu_recipe_flags_parse():
    """scripts/bear_tpu.sh — the TPU-tuned flagship recipe must parse."""
    opt = parse_args([
        "-O", "--data_type", "nerfstudio", "--data_path", "/data/bear",
        "--keyword", "lang_bear", "--workspace", "outputs/bear_recon_tpu",
        "--iters", "3000", "--train_resolution_level", "7",
        "--eval_resolution_level", "4", "--bound", "2",
        "--train_conf", "0.01", "--soft_mask",
        "--grid_type", "triplane", "--triplane_res", "128", "512",
        "--triplane_channels", "16", "8",
        "--num_steps", "40", "--upsample_steps", "0",
        "--compact_frac", "0.4", "--compact_block", "32",
        "--ckpt", "scratch",
    ])
    assert opt.cuda_ray and opt.grid_type == "triplane"
    assert opt.triplane_res == [128, 512]
    assert opt.triplane_channels == [16, 8]
    assert opt.compact_frac == 0.4 and opt.compact_block == 32


def test_clip_metrics_flags_parse():
    """--clip_metrics / --clip_ref_text (test-time CLIP score reporting)."""
    opt = parse_args([
        "--workspace", "/tmp/x", "--clip_metrics",
        "--clip_ref_text", "a photo of a bear",
        "--text", "a photo of a corgi",
    ])
    assert opt.clip_metrics is True
    assert opt.clip_ref_text == "a photo of a bear"
    opt2 = parse_args(["--workspace", "/tmp/x"])
    assert opt2.clip_metrics is False and opt2.clip_ref_text == ""


def test_eval_march_candidates_flag():
    opt = parse_args(["--workspace", "/tmp/x",
                      "--eval_march_candidates", "256"])
    assert opt.eval_march_candidates == 256
    assert parse_args(["--workspace", "/tmp/x"]).eval_march_candidates == 0


def test_inert_flags_warn_loudly(capsys):
    """Accepted-but-unwired parity flags must warn when set to a non-default
    value, and stay silent at defaults (VERDICT r3 weak #7, SURVEY §5.6)."""
    parse_args(["--workspace", "/tmp/x"])
    assert "NOT wired" not in capsys.readouterr().out

    parse_args(["--workspace", "/tmp/x", "--save_vedio",
                "--batch_size", "4"])
    out = capsys.readouterr().out
    assert "--save_vedio" in out and "NOT wired" in out
    assert "--batch_size" in out

    # wired flags never trip the warning
    parse_args(["--workspace", "/tmp/x", "--inter_pose",
                "--dont_inter_test", "--keyword2", "k2"])
    assert "NOT wired" not in capsys.readouterr().out
