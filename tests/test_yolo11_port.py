"""YOLO11-pose port parity: the flax YOLO11Pose loaded with a random-init
torch replica checkpoint (upstream state_dict naming) must match the torch
forward numerically — raw heads AND the full decode — validating every key
transform, layout transpose, BN convention, attention reshape, DFL and
anchor/keypoint decode against the ultralytics definitions."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.yolo11_torch_replica import (  # noqa: E402
    YOLO11PoseTorch,
    randomize_bn_stats,
)


@pytest.fixture(scope="module")
def ported():
    import jax.numpy as jnp

    from pose3d_tpu.stage1.yolo_port import (
        infer_architecture,
        map_yolo_state_dict,
        validate_against_model,
    )
    from pose3d_tpu.stage1.yolo11 import YOLO11Pose

    torch.manual_seed(0)
    tmodel = YOLO11PoseTorch(scale="n").eval()
    randomize_bn_stats(tmodel)
    sd = {k: v.detach().float().numpy() for k, v in
          tmodel.state_dict().items()}

    scale, nc, kpt_shape = infer_architecture(sd)
    assert (scale, nc, kpt_shape) == ("n", 1, (17, 3))

    jmodel = YOLO11Pose(scale="n", dtype=jnp.float32)
    variables = map_yolo_state_dict(sd)
    validate_against_model(jmodel, variables)
    return tmodel, jmodel, variables


def _forward_both(ported, size=64, batch=2, seed=1):
    import jax

    tmodel, jmodel, variables = ported
    rng = np.random.default_rng(seed)
    img = rng.uniform(size=(batch, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        traw = tmodel.forward_raw(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        )
        tdec = tmodel(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
    jraw = jax.jit(
        lambda v, x: jmodel.apply(v, x, train=False)
    )(variables, img)
    return img, traw, tdec, jraw


def test_raw_heads_match(ported):
    _, traw, _, jraw = _forward_both(ported)
    for lvl, ((tb, tc, tk), (jb, jc, jk)) in enumerate(zip(traw, jraw)):
        for name, t, j in (("box", tb, jb), ("cls", tc, jc),
                           ("kpt", tk, jk)):
            t = np.transpose(t.numpy(), (0, 2, 3, 1))  # NCHW → NHWC
            np.testing.assert_allclose(
                np.asarray(j), t, rtol=1e-4, atol=2e-4,
                err_msg=f"level {lvl} {name}",
            )


def test_decode_matches_ultralytics(ported):
    from pose3d_tpu.stage1.yolo11 import decode_pose

    _, _, tdec, jraw = _forward_both(ported)
    boxes, scores, kpts = decode_pose(jraw)
    # torch output layout: [B, 4 box + nc + nk, A]
    t = tdec.numpy()
    np.testing.assert_allclose(
        np.asarray(boxes), np.transpose(t[:, :4], (0, 2, 1)),
        rtol=1e-4, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(scores), np.transpose(t[:, 4:5], (0, 2, 1)),
        rtol=1e-4, atol=1e-5,
    )
    B, A = t.shape[0], t.shape[2]
    tk = np.transpose(t[:, 5:], (0, 2, 1)).reshape(B, A, 17, 3)
    np.testing.assert_allclose(
        np.asarray(kpts), tk, rtol=1e-4, atol=5e-3,
    )


def test_best_person_selection(ported):
    from pose3d_tpu.stage1.yolo11 import best_person_keypoints

    _, _, tdec, jraw = _forward_both(ported)
    kp, conf = best_person_keypoints(jraw, input_size=64)
    t = tdec.numpy()
    best = t[:, 4].argmax(axis=1)
    for b in range(t.shape[0]):
        tk = t[b, 5:, best[b]].reshape(17, 3)
        got = np.asarray(kp[b])
        np.testing.assert_allclose(got[:, 0], tk[:, 0] / 64, atol=1e-4)
        np.testing.assert_allclose(got[:, 1], tk[:, 1] / 64, atol=1e-4)
        np.testing.assert_allclose(got[:, 2], tk[:, 2], atol=1e-5)
        assert np.isclose(float(conf[b]), t[b, 4].max(), atol=1e-5)


def test_nms_persons_static_shapes(ported):
    import jax

    from pose3d_tpu.stage1.yolo11 import decode_pose, nms_persons

    _, _, _, jraw = _forward_both(ported)
    boxes, scores, kpts = decode_pose(jraw)
    out_k, out_c = jax.jit(
        lambda b, s, k: nms_persons(b, s, k, max_det=5, conf_threshold=0.0)
    )(boxes, scores, kpts)
    assert out_k.shape == (2, 5, 17, 3) and out_c.shape == (2, 5)
    c = np.asarray(out_c)
    assert (np.diff(c, axis=1) <= 1e-6).all()  # descending confidence


def test_ultralytics_pickle_loads_without_package(tmp_path):
    """A checkpoint pickled with ultralytics-module class references must
    load through the stub importer when ultralytics is absent."""
    import types

    from pose3d_tpu.stage1.yolo_port import load_ultralytics_state_dict

    assert "ultralytics" not in sys.modules or not hasattr(
        sys.modules.get("ultralytics"), "__version__"
    ), "test assumes ultralytics is not installed"

    torch.manual_seed(1)
    inner = YOLO11PoseTorch(scale="n").eval()

    # Fabricate a wrapper class that pickles as ultralytics.nn.tasks.PoseModel
    fake_mod = types.ModuleType("ultralytics.nn.tasks")
    PoseModel = type(
        "PoseModel", (torch.nn.Module,),
        {"__module__": "ultralytics.nn.tasks"},
    )
    fake_mod.PoseModel = PoseModel
    wrapper = PoseModel()
    wrapper.model = inner.model
    pkg = types.ModuleType("ultralytics")
    nn_mod = types.ModuleType("ultralytics.nn")
    sys.modules["ultralytics"] = pkg
    sys.modules["ultralytics.nn"] = nn_mod
    sys.modules["ultralytics.nn.tasks"] = fake_mod
    try:
        path = tmp_path / "fake_yolo11n-pose.pt"
        torch.save({"model": wrapper, "train_args": {}}, path)
    finally:
        for name in ("ultralytics.nn.tasks", "ultralytics.nn",
                     "ultralytics"):
            sys.modules.pop(name, None)

    sd = load_ultralytics_state_dict(path)
    ref = {k: v.detach().float().numpy() for k, v in
           inner.state_dict().items()}
    assert set(sd) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(sd[k], ref[k])


def test_load_yolo11_pose_end_to_end(tmp_path):
    """load_yolo11_pose on a replica state_dict file → working jit model."""
    import jax

    from pose3d_tpu.stage1.yolo_port import load_yolo11_pose

    torch.manual_seed(2)
    tmodel = YOLO11PoseTorch(scale="n").eval()
    randomize_bn_stats(tmodel, seed=2)
    path = tmp_path / "yolo11n-pose-sd.pt"
    torch.save(tmodel.state_dict(), path)

    model, variables = load_yolo11_pose(path)
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    raw = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, img
    )
    with torch.no_grad():
        traw = tmodel.forward_raw(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        )
    np.testing.assert_allclose(
        np.asarray(raw[0][2]),
        np.transpose(traw[0][2].numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=2e-4,
    )


@pytest.mark.parametrize("scale", ["s", "m", "l"])
def test_scale_inference_and_structure(scale):
    """Architecture inference + mapped-tree structure for the other YOLO11
    scales (no forward — eval_shape only, so even l stays fast)."""
    import jax.numpy as jnp

    from pose3d_tpu.stage1.yolo_port import (
        infer_architecture,
        map_yolo_state_dict,
        validate_against_model,
    )
    from pose3d_tpu.stage1.yolo11 import YOLO11Pose

    torch.manual_seed(3)
    tmodel = YOLO11PoseTorch(scale=scale)
    sd = {k: v.detach().float().numpy() for k, v in
          tmodel.state_dict().items()}
    got_scale, nc, kpt_shape = infer_architecture(sd)
    assert (got_scale, nc, kpt_shape) == (scale, 1, (17, 3))
    jmodel = YOLO11Pose(scale=scale, dtype=jnp.float32)
    validate_against_model(jmodel, map_yolo_state_dict(sd))
