"""Micro-repro: grad through a single batch_pallas BN at various shapes."""
import sys
import numpy as np


def case(shape):
    import jax
    import jax.numpy as jnp
    from pose3d_tpu.models.cnn import DotStatsBatchNorm

    m = DotStatsBatchNorm(use_running_average=False, stats="pallas")
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(x):
        out, _ = m.apply(v, x, mutable=["batch_stats"])
        return (out ** 2).mean()

    g = jax.jit(jax.grad(loss))(x)
    np.asarray(g)
    return "OK"


def main():
    from pose3d_tpu.core.runtime import apply_tpu_workarounds
    apply_tpu_workarounds()
    for shape in [(10, 250, 250, 64), (10, 125, 125, 128),
                  (10, 63, 63, 256), (100, 250, 250, 64)]:
        try:
            print(f"{shape}: {case(shape)}", flush=True)
        except Exception as e:
            print(f"{shape}: CRASH {type(e).__name__} {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
