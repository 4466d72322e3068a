"""Model complexity accounting (the role of EVC's model_complexity.py
MACs counter, reference DCVC-family/EVC/model_complexity.py).

TPU-native approach: lower the jitted program and read XLA's own cost
analysis (flops / bytes accessed) instead of re-deriving per-layer MAC
formulas — the numbers match what the compiler actually schedules.
"""

import jax
import jax.numpy as jnp


def cost_analysis(fn, *args):
    """Compile fn(*args) and return XLA's cost analysis dict
    (keys include 'flops', 'bytes accessed', per-op categories)."""
    compiled = jax.jit(fn).lower(*args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # one entry per computation
        costs = costs[0]
    return dict(costs or {})


def count_macs(fn, *args):
    """Approximate multiply-accumulates = flops / 2."""
    return int(cost_analysis(fn, *args).get("flops", 0) // 2)


def model_macs_per_pixel(model, params, h=256, w=256, qp=0):
    """kMACs/pixel of a codec training forward at (h, w)."""
    x_shape = None
    import inspect
    rng = jax.random.PRNGKey(0)

    def fwd(x):
        return model.apply({"params": params}, x, qp, rng)

    x = jnp.zeros((1, h, w, 3), jnp.float32)
    macs = count_macs(fwd, x)
    return macs / (h * w) / 1000.0


def summarize(model, params, resolutions=((256, 256), (1080, 1920))):
    """Human-readable complexity summary across resolutions."""
    lines = []
    for h, w in resolutions:
        kmacs = model_macs_per_pixel(model, params, h, w)
        lines.append(f"{h}x{w}: {kmacs:.1f} kMACs/pixel")
    return "\n".join(lines)
