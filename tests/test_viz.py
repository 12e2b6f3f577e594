"""Offline visualizer: TUM load, HTML replay artifact, PNG summary."""

import numpy as np

from ctrlvio_tpu.utils import viz
from ctrlvio_tpu.utils.export import export_tum


def _traj(n=50):
    t = np.arange(n) * 0.1
    p = np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=1)
    q = np.tile([1.0, 0, 0, 0], (n, 1))
    return t, p, q


def test_tum_roundtrip(tmp_path):
    t, p, q = _traj()
    f = tmp_path / "a.tum"
    export_tum(str(f), (t * 1e9).astype(np.int64), q, p)
    t2, p2, q2 = viz.load_tum(str(f))
    np.testing.assert_allclose(t2, t, atol=1e-9)
    np.testing.assert_allclose(p2, p, atol=1e-6)
    np.testing.assert_allclose(q2, q, atol=1e-9)


def test_html_and_png_artifacts(tmp_path):
    t, p, q = _traj()
    rng = np.random.default_rng(0)
    html = viz.write_html_replay(
        str(tmp_path / "r.html"), t, p, p_gt=p + 0.01,
        knots=p[::5], points=rng.normal(size=(9000, 3)))
    s = open(html).read()
    assert s.startswith("<!DOCTYPE html>") and "</html>" in s
    assert '"est": [[' in s and '"knots"' in s
    assert "{data}" not in s and "{nmax}" not in s
    png = viz.write_png(str(tmp_path / "r.png"), t, p, p_gt=p + 0.01,
                        knots=p[::5])
    assert open(png, "rb").read(8)[1:4] == b"PNG"


def test_viz_cli(tmp_path):
    from ctrlvio_tpu.__main__ import main

    t, p, q = _traj()
    f = tmp_path / "a.tum"
    export_tum(str(f), (t * 1e9).astype(np.int64), q, p)
    out = tmp_path / "a.html"
    main(["viz", str(f), "-o", str(out), "--png", str(tmp_path / "a.png")])
    assert out.exists() and (tmp_path / "a.png").exists()
