"""Asset-free demo pipeline (tpubody/pipelines/demo.py)."""
import os

import numpy as np
import pytest

from tpubody.pipelines import demo
from tpubody.pipelines import reconstruct as rec


def test_make_fixture_writes_reference_layout(tmp_path):
    """The generated fixture dir matches data/tests/testNN: loadable by
    load_test_dir, keypoints parse, mask is the body silhouette, the
    pickle round-trips pose/camera."""
    from tpubody.fit import keypoints as kp_lib

    out = str(tmp_path / "fx")
    smplh, smpl = demo.make_fixture(out, size=128, verts=1500, seed=0)
    front, back, mask, fit = rec.load_test_dir(out)
    assert front.shape == (128, 128, 3) and mask.shape == (128, 128)
    assert 200 < (mask > 0).sum() < 128 * 128 * 0.9
    assert fit.pose.shape == (156,)
    np.testing.assert_allclose(fit.camera_rotation, np.eye(3))
    kp = kp_lib.read_openpose_json(os.path.join(out, "0_keypoints.json"))
    assert kp.keypoints.shape == (67, 3)
    # body keypoints land on/near the silhouette (valid projections)
    xy = kp.keypoints[:25, :2]
    assert ((xy >= 0) & (xy < 128)).all()
    # fixture conf.yaml loads back through the config system
    from tpubody.pipelines import gen_smplh as gen_lib
    cfg = gen_lib.load_config(os.path.join(out, "conf.yaml"))
    assert cfg.focal_length == pytest.approx(5000.0 * 128 / 1024.0)


@pytest.mark.slow
def test_run_demo_end_to_end(tmp_path):
    """Fixture -> reconstruct -> hand graft -> animate -> GLB, one call
    (compile-heavy; the graft must succeed, not degrade)."""
    import sys

    out = str(tmp_path / "demo")
    # animate_frames=0: the animate leg is covered by test_animate; the
    # compile would roughly double this test's wall time.
    arts = demo.run_demo(out, size=192, verts=2500, animate_frames=0)
    for name in ("front_rgb.png", "mask.png", "0_keypoints.json",
                 "smplh.pkl", "replace_hands_recover.pkl", "out.ply",
                 "avatar.glb"):
        assert os.path.exists(arts[name]), name
    from tpubody.mesh import rigging
    avatar = rigging.load_avatar(arts["replace_hands_recover.pkl"])
    assert np.isfinite(avatar.v_template).all()
    assert avatar.weights.shape[1] == 24
