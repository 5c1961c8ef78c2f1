"""CLI subcommands + offline rendering smoke tests."""
import json
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run(args):
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "JAX_PLATFORMS": "cpu"}
    return subprocess.run(
        [sys.executable, "-m", "iterative_solvers_tpu.cli", *args],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=500,
    )


def test_cli_sh(tmp_path):
    ck = tmp_path / "sh.npz"
    png = tmp_path / "sh.png"
    res = _run(["sh", "--n", "24", "--steps", "3", "--x64",
                "--checkpoint", str(ck), "--render", str(png),
                "--metrics", str(tmp_path / "m.jsonl")])
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["final_fnorm"] <= 6e-6
    assert ck.exists() and png.stat().st_size > 1000
    assert (tmp_path / "m.jsonl").read_text().count("\n") == 3


def test_cli_poisson():
    res = _run(["poisson", "--n", "64"])
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["rel_err"] < 5e-3


def test_cli_mems(tmp_path):
    png = tmp_path / "mems.png"
    res = _run(["mems", "--n", "31", "--steps", "3", "--render", str(png)])
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["u_min"] < 0
    assert png.exists()


def test_cli_droplet_fixture(tmp_path):
    fixture = "/root/reference/python_work/initdrop_rect_1_61-61_100_0.01_0.01_0.1_0.15.txt"
    ck = tmp_path / "drop.npz"
    res = _run(["droplet", "--fixture", fixture, "--steps", "2",
                "--pma-loops", "3", "--checkpoint", str(ck)])
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["min_spacing"] > 0
    assert ck.exists()
    # restart path
    res2 = _run(["droplet", "--restart", str(ck), "--steps", "1",
                 "--pma-loops", "3"])
    assert res2.returncode == 0, res2.stderr[-2000:]


def test_render_animation_fallback(tmp_path):
    from iterative_solvers_tpu.utils.render import save_animation

    frames = [np.random.rand(8, 8) for _ in range(3)]
    save_animation(frames, tmp_path / "anim.gif", fps=2)
    # either the gif or the png fallback directory must exist
    assert (tmp_path / "anim.gif").exists() or (tmp_path / "anim").exists()
