"""Block-level numerical parity: port weights from the REFERENCE's torch CNN
blocks (imported from /root/reference/src, never copied) onto our Flax
blocks and compare outputs on identical inputs (eval mode, fp32).

Covers the block zoo: ConvBnAct, SEBlock, ECABlock, DepthwiseSeparableConv,
InvertedResidual (with SE), DualPathBlock and WASPModule — validating every
conv/BN/linear transposition convention and the stage plumbing."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = Path("/root/reference")
if not (REF / "src").exists():
    pytest.skip("reference tree not available", allow_module_level=True)
sys.path.insert(0, str(REF / "src"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from models import cnn as ref_cnn  # noqa: E402  (reference torch blocks)

from pose3d_tpu.models import cnn as our_cnn  # noqa: E402

rng = np.random.default_rng(0)


# -- weight-mapping helpers -------------------------------------------------

def conv_k(w):  # torch [O, I/g, kh, kw] → flax [kh, kw, I/g, O]
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def convbnact(mod):
    """reference ConvBnAct → {params, batch_stats} subtrees."""
    p = {"Conv_0": {"kernel": conv_k(mod.conv.weight)},
         "BatchNorm_0": {"scale": mod.norm.weight.detach().numpy(),
                         "bias": mod.norm.bias.detach().numpy()}}
    s = {"BatchNorm_0": {"mean": mod.norm.running_mean.numpy(),
                         "var": mod.norm.running_var.numpy()}}
    return p, s


def dwsep(mod):
    p0, s0 = convbnact(mod.depthwise)
    p1, s1 = convbnact(mod.pointwise)
    return ({"ConvBnAct_0": p0, "ConvBnAct_1": p1},
            {"ConvBnAct_0": s0, "ConvBnAct_1": s1})


def se_block(mod):
    return {"Dense_0": {"kernel": mod.fc[0].weight.detach().numpy().T},
            "Dense_1": {"kernel": mod.fc[2].weight.detach().numpy().T}}


def eca_block(mod):
    # torch Conv1d weight [1, 1, k] → flax Conv kernel [k, 1, 1]
    return {"Conv_0": {
        "kernel": np.transpose(mod.conv.weight.detach().numpy(), (2, 1, 0))
    }}


def _x(c, h=8, w=8, n=2):
    return rng.normal(size=(n, h, w, c)).astype(np.float32)


def _run_ref(mod, x_nhwc):
    mod.eval()
    with torch.no_grad():
        out = mod(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    return np.transpose(out.numpy(), (0, 2, 3, 1))


def _assert_close(ours, ref, tol=2e-5):
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=tol, atol=tol)


# -- tests -------------------------------------------------------------------

def test_convbnact_parity():
    tmod = ref_cnn.ConvBnAct(8, 16, kernel_size=3, stride=2)
    # randomize BN stats so the test is non-trivial
    tmod.norm.running_mean.copy_(torch.randn(16) * 0.1)
    tmod.norm.running_var.copy_(torch.rand(16) + 0.5)
    x = _x(8, 9, 9)  # odd size exercises padding/stride conventions
    ref = _run_ref(tmod, x)

    p, s = convbnact(tmod)
    ours = our_cnn.ConvBnAct(16, 3, 2, dtype=jnp.float32).apply(
        {"params": p, "batch_stats": s}, jnp.asarray(x), False
    )
    _assert_close(ours, ref)


def test_se_block_parity():
    tmod = ref_cnn.SEBlock(16, reduction=4)
    x = _x(16)
    ref = _run_ref(tmod, x)
    ours = our_cnn.SEBlock(4, dtype=jnp.float32).apply(
        {"params": se_block(tmod)}, jnp.asarray(x)
    )
    _assert_close(ours, ref)


def test_eca_block_parity():
    tmod = ref_cnn.ECABlock(32)
    x = _x(32)
    ref = _run_ref(tmod, x)
    ours = our_cnn.ECABlock(dtype=jnp.float32).apply(
        {"params": eca_block(tmod)}, jnp.asarray(x)
    )
    _assert_close(ours, ref)


def test_depthwise_separable_parity():
    tmod = ref_cnn.DepthwiseSeparableConv(8, 12, stride=2)
    x = _x(8, 10, 10)
    ref = _run_ref(tmod, x)
    p, s = dwsep(tmod)
    ours = our_cnn.DepthwiseSeparableConv(12, stride=2, dtype=jnp.float32).apply(
        {"params": p, "batch_stats": s}, jnp.asarray(x), False
    )
    _assert_close(ours, ref)


def test_inverted_residual_parity():
    tmod = ref_cnn.InvertedResidual(
        8, 8, stride=1, expand_ratio=3, use_se=True, se_reduction=4,
    )
    x = _x(8)
    ref = _run_ref(tmod, x)

    # reference .conv Sequential: [expand CBA, dw CBA, SEBlock, proj CBA]
    pe, se_ = convbnact(tmod.conv[0])
    pd, sd = convbnact(tmod.conv[1])
    pse = se_block(tmod.conv[2])
    pp, sp = convbnact(tmod.conv[3])
    params = {"ConvBnAct_0": pe, "ConvBnAct_1": pd, "SEBlock_0": pse,
              "ConvBnAct_2": pp}
    stats = {"ConvBnAct_0": se_, "ConvBnAct_1": sd, "ConvBnAct_2": sp}
    ours = our_cnn.InvertedResidual(
        8, stride=1, expand_ratio=3, use_se=True, se_reduction=4,
        dtype=jnp.float32,
    ).apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    _assert_close(ours, ref)


def test_dual_path_block_parity():
    tmod = ref_cnn.DualPathBlock(16, 16, stride=1, attention_type=None)
    x = _x(16)
    ref = _run_ref(tmod, x)

    p0, s0 = convbnact(tmod.residual_path[0])
    p1, s1 = dwsep(tmod.residual_path[1])
    p2, s2 = convbnact(tmod.residual_path[2])
    p3, s3 = convbnact(tmod.dense_path[0])
    p4, s4 = dwsep(tmod.dense_path[1])
    pf, sf = convbnact(tmod.fusion)
    params = {
        "ConvBnAct_0": p0, "DepthwiseSeparableConv_0": p1,
        "ConvBnAct_1": p2, "ConvBnAct_2": p3,
        "DepthwiseSeparableConv_1": p4, "ConvBnAct_3": pf,
    }
    stats = {
        "ConvBnAct_0": s0, "DepthwiseSeparableConv_0": s1,
        "ConvBnAct_1": s2, "ConvBnAct_2": s3,
        "DepthwiseSeparableConv_1": s4, "ConvBnAct_3": sf,
    }
    ours = our_cnn.DualPathBlock(16, stride=1, dtype=jnp.float32).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    _assert_close(ours, ref)


def test_wasp_module_parity():
    tmod = ref_cnn.WASPModule(16, 16)
    with torch.no_grad():
        tmod.weights.copy_(torch.randn(6) * 0.3)  # non-uniform branch weights
    x = _x(16, 12, 12)
    ref = _run_ref(tmod, x)

    p1, s1 = convbnact(tmod.conv1x1)
    branches = [convbnact(b) for b in tmod.atrous_branches]
    pg, sg = convbnact(tmod.global_branch[1])
    pf, sf = convbnact(tmod.fusion)
    params = {"ConvBnAct_0": p1, "branch_weights": tmod.weights.detach().numpy()}
    stats = {"ConvBnAct_0": s1}
    for i, (pb, sb) in enumerate(branches):
        params[f"ConvBnAct_{i+1}"] = pb
        stats[f"ConvBnAct_{i+1}"] = sb
    params["ConvBnAct_5"] = pg
    stats["ConvBnAct_5"] = sg
    params["ConvBnAct_6"] = pf
    stats["ConvBnAct_6"] = sf
    ours = our_cnn.WASPModule(16, dtype=jnp.float32).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    _assert_close(ours, ref, tol=1e-4)


def test_coord_attention_parity():
    tmod = ref_cnn.CoordAttention(32, 32, reduction=4)
    tmod.bn1.running_mean.copy_(torch.randn(8) * 0.1)
    tmod.bn1.running_var.copy_(torch.rand(8) + 0.5)
    x = _x(32, 6, 10)  # non-square: catches any h/w mixup
    ref = _run_ref(tmod, x)

    def conv1d_k(w):  # torch [O, I, 1, 1] → flax 1-d conv [1, I, O]
        return np.transpose(w.detach().numpy()[:, :, :, 0], (2, 1, 0))

    params = {
        "Conv_0": {"kernel": conv1d_k(tmod.conv1.weight),
                   "bias": tmod.conv1.bias.detach().numpy()},
        "BatchNorm_0": {"scale": tmod.bn1.weight.detach().numpy(),
                        "bias": tmod.bn1.bias.detach().numpy()},
        "Conv_1": {"kernel": conv1d_k(tmod.conv_h.weight),
                   "bias": tmod.conv_h.bias.detach().numpy()},
        "Conv_2": {"kernel": conv1d_k(tmod.conv_w.weight),
                   "bias": tmod.conv_w.bias.detach().numpy()},
    }
    stats = {"BatchNorm_0": {"mean": tmod.bn1.running_mean.numpy(),
                             "var": tmod.bn1.running_var.numpy()}}
    ours = our_cnn.CoordAttention(32, reduction=4, dtype=jnp.float32).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    _assert_close(ours, ref, tol=1e-4)
