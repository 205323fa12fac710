"""Transformer (ViT-based) lifting model (Flax / TPU-first).

Capability parity with the reference (src/models/transformers.py:140-373):

  * image/depth stream: a ViT backbone over the 4-channel [RGB|depth]
    input. The reference wraps timm's pretrained ``vit_base_patch16_384``
    and inflates its patch-embed conv from 3 to 4 channels
    (transformers.py:184-224); here the backbone is a native Flax ViT with
    the same geometry (patch 16, depth 12, dim 768, 512×512 → 1024 tokens
    + CLS) and a weight-porting hook (``pose3d_tpu.stage1.port``) that
    performs the same RGB-copy + mean-channel inflation when a pretrained
    torch checkpoint is supplied.
  * heatmap stream: Gaussian heatmaps (64×64, σ=2) → conv patch-embed
    (16×16 → 16 tokens) + learned positional embedding.
  * 2 bidirectional cross-modal fusion blocks, then a final CLS token +
    positional embedding over 1+1024+16 tokens, 4 encoder blocks, LayerNorm,
    CLS → MLP head (1024, 512, 256).

TPU-first: attention runs through pose3d_tpu.ops.attention (Pallas-ready),
compute dtype bf16 with fp32 LayerNorm/softmax, all shapes static.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pose3d_tpu.core.config import TransformerModelConfig
from pose3d_tpu.models.common import PoseRegressionHead
from pose3d_tpu.ops.activations import get_activation
from pose3d_tpu.ops.attention import dot_product_attention
from pose3d_tpu.ops.heatmap import gaussian_heatmaps

# xavier-uniform: the reference initializes every Linear in the fusion /
# final-encoder / head this way (src/models/transformers.py:317-321).
xavier = nn.initializers.xavier_uniform()


class MultiHeadAttention(nn.Module):
    """QKV projection + attention core + output projection."""

    num_heads: int
    dropout: float = 0.0
    attention_backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, *, deterministic: bool = True):
        d_model = q_in.shape[-1]
        head_dim = d_model // self.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (self.num_heads, head_dim), axis=-1, name=name,
            kernel_init=xavier,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        q = dense("query")(q_in)
        k = dense("key")(kv_in)
        v = dense("value")(kv_in)
        out = dot_product_attention(q, k, v, backend=self.attention_backend)
        out = nn.DenseGeneral(
            d_model, axis=(-2, -1), name="out", kernel_init=xavier,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class Mlp(nn.Module):
    hidden_ratio: float = 4.0
    dropout: float = 0.0
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        d = x.shape[-1]
        h = int(d * self.hidden_ratio)
        x = nn.Dense(h, kernel_init=xavier, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        x = get_activation(self.activation)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(d, kernel_init=xavier, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


def _ln(dtype, param_dtype, name=None):
    # LayerNorm statistics in fp32 for bf16 inputs.
    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, param_dtype=param_dtype,
                        name=name)


class TransformerEncoderBlock(nn.Module):
    """Pre-LN self-attention block (reference src/models/transformers.py:49-82)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation: str = "gelu"
    attention_backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = _ln(self.dtype, self.param_dtype)(x)
        y = MultiHeadAttention(
            self.num_heads, self.dropout, self.attention_backend,
            self.dtype, self.param_dtype,
        )(y, y, deterministic=deterministic)
        x = x + y
        y = _ln(self.dtype, self.param_dtype)(x)
        y = Mlp(self.mlp_ratio, self.dropout, self.activation,
                self.dtype, self.param_dtype)(y, deterministic=deterministic)
        return x + y


class CrossModalFusionBlock(nn.Module):
    """Bidirectional cross-attention between image and heatmap token streams
    plus per-stream MLPs (reference src/models/transformers.py:85-137)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation: str = "gelu"
    attention_backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_img, x_hm, deterministic: bool = True):
        det = deterministic
        # img attends to heatmap tokens
        q = _ln(self.dtype, self.param_dtype)(x_img)
        kv = _ln(self.dtype, self.param_dtype)(x_hm)
        x_img = x_img + MultiHeadAttention(
            self.num_heads, self.dropout, self.attention_backend,
            self.dtype, self.param_dtype, name="img_to_hm",
        )(q, kv, deterministic=det)
        # heatmap attends to (updated) image tokens
        q = _ln(self.dtype, self.param_dtype)(x_hm)
        kv = _ln(self.dtype, self.param_dtype)(x_img)
        x_hm = x_hm + MultiHeadAttention(
            self.num_heads, self.dropout, self.attention_backend,
            self.dtype, self.param_dtype, name="hm_to_img",
        )(q, kv, deterministic=det)
        # per-stream MLPs
        x_img = x_img + Mlp(
            self.mlp_ratio, self.dropout, self.activation,
            self.dtype, self.param_dtype, name="mlp_img",
        )(_ln(self.dtype, self.param_dtype)(x_img), deterministic=det)
        x_hm = x_hm + Mlp(
            self.mlp_ratio, self.dropout, self.activation,
            self.dtype, self.param_dtype, name="mlp_hm",
        )(_ln(self.dtype, self.param_dtype)(x_hm), deterministic=det)
        return x_img, x_hm


class PatchEmbedding(nn.Module):
    """Conv patch projection [B,H,W,C] -> [B, N, D]
    (reference src/models/transformers.py:33-46)."""

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        if x.shape[1] % p or x.shape[2] % p:
            raise ValueError(
                f"Image dims {x.shape[1]}x{x.shape[2]} must be divisible by "
                f"patch size {p}."
            )
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        return x.reshape(x.shape[0], -1, self.embed_dim)


class ViTBackbone(nn.Module):
    """Plain ViT encoder (geometry of vit_base_patch16 at 512×512):
    patch-embed → [CLS]+pos-embed → N pre-LN blocks → LayerNorm.

    Stands in for the reference's timm backbone
    (src/models/transformers.py:174-179); pretrained torch weights can be
    ported onto it including the 3→4 channel patch-embed inflation.

    ``stacked_blocks=True`` stores the N encoder blocks as ONE stacked
    parameter subtree (``blocks``, leading layer dim) and applies them via
    ``lax.scan`` — or via ``block_runner`` (e.g.
    parallel/pp.make_pipeline_runner for GPipe pipeline parallelism, where
    the layer dim is sharded over a mesh ``stage`` axis). Converters
    between the looped (weight-porting) and stacked layouts live in
    parallel/pp.py. The stacked path requires dropout == 0 (the flagship
    backbone already runs dropout 0): a pipelined layer replays on every
    stage each tick, so per-call dropout rng would diverge from the
    sequential schedule.
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_backend: str = "xla"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    stacked_blocks: bool = False
    block_runner: object = None  # (block_apply, stacked_params, x) -> x
    sp_constraint: object = None  # Megatron-SP residual-stream constraint

    def _stacked_blocks(self, tokens, deterministic):
        import jax

        if self.dropout != 0.0:
            raise ValueError("stacked_blocks requires dropout == 0.0")
        del deterministic  # dropout 0: blocks are deterministic
        block_args = (
            self.num_heads, self.mlp_ratio, 0.0, 0.0, "gelu",
        )
        template = TransformerEncoderBlock(
            *block_args, self.attention_backend, self.dtype,
            self.param_dtype,
        )
        # init template pinned to the plain-XLA attention path: parameter
        # shapes/values are backend-independent and the tiny dummy shapes
        # used here need not satisfy Pallas kernel tiling constraints.
        init_template = TransformerEncoderBlock(
            *block_args, "xla", self.dtype, self.param_dtype,
        )

        def init_stacked(rng):
            keys = jax.random.split(rng, self.depth)
            dummy = jnp.zeros((1, 8, self.embed_dim), self.dtype)
            return jax.vmap(
                lambda k: init_template.init(k, dummy, True)["params"]
            )(keys)

        stacked = self.param("blocks", init_stacked)

        def block_apply(p, y):
            return template.apply({"params": p}, y, True)

        if self.remat:
            block_apply = jax.checkpoint(block_apply)
        if self.block_runner is not None:
            if self.sp_constraint is not None:
                raise ValueError(
                    "sp_constraint does not compose with a pipeline "
                    "block_runner (the GPipe schedule owns the token "
                    "layout inside its stage loop)"
                )
            return self.block_runner(block_apply, stacked, tokens)
        if self.sp_constraint is not None:
            inner, sp = block_apply, self.sp_constraint
            block_apply = lambda p, y: sp(inner(p, y))  # noqa: E731
        return jax.lax.scan(
            lambda c, p: (block_apply(p, c), None), tokens, stacked
        )[0]

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B = x.shape[0]
        Block = (
            nn.remat(TransformerEncoderBlock, static_argnums=(2,))
            if self.remat else TransformerEncoderBlock
        )
        tokens = PatchEmbedding(
            self.patch_size, self.embed_dim, self.dtype, self.param_dtype,
            name="patch_embed",
        )(x)
        n = tokens.shape[1]
        cls = self.param(
            "cls_token",
            nn.initializers.truncated_normal(0.02),
            (1, 1, self.embed_dim), self.param_dtype,
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, 1 + n, self.embed_dim), self.param_dtype,
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(tokens.dtype),
             tokens], axis=1,
        )
        tokens = tokens + pos.astype(tokens.dtype)
        tokens = nn.Dropout(self.dropout, deterministic=deterministic)(tokens)
        sp = self.sp_constraint or (lambda t: t)
        if self.stacked_blocks:
            tokens = self._stacked_blocks(sp(tokens), deterministic)
        else:
            tokens = sp(tokens)
            for i in range(self.depth):
                tokens = sp(Block(
                    self.num_heads, self.mlp_ratio, self.dropout,
                    self.dropout, "gelu", self.attention_backend,
                    self.dtype, self.param_dtype, name=f"block_{i}",
                )(tokens, deterministic))
        return _ln(self.dtype, self.param_dtype, name="norm")(tokens)


class TransformerPoseEstimation(nn.Module):
    """Transformer 3D pose lifting model
    (reference src/models/transformers.py:140-373).

    forward(image [B,H,W,3], depth [B,H,W,1], keypoints_2d [B,J,2])
      -> joints_3d [B,J,3]

    attention_backend "pallas" (default) runs the fused VMEM-resident
    kernel on TPU (measured 16% faster forward and ~3x faster compile than
    the XLA path at the full 512×512 config) and silently degrades to the
    XLA einsum path on other backends.
    """

    config: TransformerModelConfig
    attention_backend: str = "pallas"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize encoder blocks (trade FLOPs for HBM)
    # pipeline-parallel readiness (parallel/pp.py): store the ViT encoder
    # blocks stacked; optionally run them through a GPipe stage pipeline.
    vit_stacked: bool = False
    vit_block_runner: object = None
    # Megatron sequence parallelism (parallel/sp.py): residual token
    # streams constrained token-sharded over the mesh model axis.
    sp_constraint: object = None

    @nn.compact
    def __call__(self, image, depth, keypoints_2d, *, train: bool = False):
        cfg = self.config
        det = not train
        B = image.shape[0]
        D = cfg.transformer_embed_dim
        EncoderBlock = (
            nn.remat(TransformerEncoderBlock, static_argnums=(2,))
            if self.remat else TransformerEncoderBlock
        )
        FusionBlock = (
            nn.remat(CrossModalFusionBlock, static_argnums=(3,))
            if self.remat else CrossModalFusionBlock
        )

        # --- image/depth stream (reference transformers.py:326-346) ---
        x = jnp.concatenate(
            [image.astype(self.dtype), depth.astype(self.dtype)], axis=-1
        )
        vit_tokens = ViTBackbone(
            embed_dim=D, depth=cfg.vit_depth, num_heads=cfg.vit_heads,
            patch_size=cfg.vit_patch_size, mlp_ratio=4.0,
            dropout=0.0, attention_backend=self.attention_backend,
            dtype=self.dtype, param_dtype=self.param_dtype,
            remat=self.remat, stacked_blocks=self.vit_stacked,
            block_runner=self.vit_block_runner,
            sp_constraint=self.sp_constraint, name="vit_backbone",
        )(x, deterministic=det)
        img_tokens = vit_tokens[:, 1:]  # strip CLS prefix token

        # --- heatmap stream (reference transformers.py:238-253, 348-350) ---
        heatmaps = gaussian_heatmaps(
            keypoints_2d, cfg.heatmap_size, cfg.heatmap_sigma, dtype=self.dtype
        )
        hm_tokens = PatchEmbedding(
            cfg.heatmap_patch_size, D, self.dtype, self.param_dtype,
            name="heatmap_patch_embed",
        )(heatmaps)
        n_hm = hm_tokens.shape[1]
        pos_hm = self.param(
            "pos_embed_hm",
            nn.initializers.truncated_normal(0.02),
            (1, n_hm, D), self.param_dtype,
        )
        hm_tokens = hm_tokens + pos_hm.astype(hm_tokens.dtype)

        # --- cross-modal fusion (reference transformers.py:256-268, 352-356) ---
        sp = self.sp_constraint or (lambda t: t)
        for i in range(cfg.num_cross_modal_layers):
            img_tokens, hm_tokens = FusionBlock(
                cfg.transformer_heads, cfg.transformer_mlp_ratio,
                cfg.transformer_dropout_rate,
                cfg.transformer_attention_dropout_rate,
                cfg.activation, self.attention_backend,
                self.dtype, self.param_dtype, name=f"fusion_{i}",
            )(img_tokens, hm_tokens, det)
            img_tokens, hm_tokens = sp(img_tokens), sp(hm_tokens)

        # --- final encoder over [CLS | img | hm] (transformers.py:271-304) ---
        n_total = 1 + img_tokens.shape[1] + n_hm
        cls = self.param(
            "final_cls_token",
            nn.initializers.truncated_normal(0.02),
            (1, 1, D), self.param_dtype,
        )
        pos = self.param(
            "final_pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, n_total, D), self.param_dtype,
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, D)).astype(img_tokens.dtype),
             img_tokens, hm_tokens], axis=1,
        )
        tokens = tokens + pos.astype(tokens.dtype)
        tokens = nn.Dropout(
            cfg.transformer_dropout_rate, deterministic=det
        )(tokens)
        tokens = sp(tokens)
        for i in range(cfg.final_encoder_depth):
            tokens = sp(EncoderBlock(
                cfg.transformer_heads, cfg.transformer_mlp_ratio,
                cfg.transformer_dropout_rate,
                cfg.transformer_attention_dropout_rate,
                cfg.activation, self.attention_backend,
                self.dtype, self.param_dtype, name=f"final_block_{i}",
            )(tokens, det))

        cls_out = _ln(self.dtype, self.param_dtype, name="norm_out")(
            tokens[:, 0]
        )
        return PoseRegressionHead(
            cfg.num_joints,
            hidden_dims=cfg.regression_hidden_dims,
            dropout=cfg.regression_dropout,
            activation=cfg.activation,
            init="xavier",
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="pose_head",
        )(cls_out, deterministic=det)
