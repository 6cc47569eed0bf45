"""Learning-rate schedules.

``onecycle_schedule`` replicates torch ``OneCycleLR`` (cos anneal, the
reference's exact setup: ``OneCycleLR(max_lr, pct_start=1/50,
steps_per_epoch, epochs=80)`` at blip_fine_tune_2.py:261 — note the
reference schedules over 80 epochs but trains fewer, so only a prefix of
the cycle is traversed; we reproduce that faithfully via ``total_steps``).

The LAVIS registry schedules (reference src/lavis/common/optims.py:13-117)
are provided as well: ``linear_warmup_cosine`` and ``linear_warmup_step``.
"""

from __future__ import annotations

from sprc_tpu.registry import registry


def onecycle_schedule(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """torch.optim.lr_scheduler.OneCycleLR with anneal_strategy='cos'.

    Returns f(step) -> lr. Step 0 corresponds to the LR used for the first
    optimizer step (torch initializes the optimizer lr to ``initial_lr``
    before any ``scheduler.step()``).
    """
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_steps = float(pct_start * total_steps) - 1.0
    down_steps = float(total_steps - up_steps - 1.0)

    def _anneal(start: float, end: float, frac):
        import jax.numpy as jnp

        cos_out = jnp.cos(jnp.pi * frac) + 1.0
        return end + (start - end) / 2.0 * cos_out

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        up = _anneal(initial_lr, max_lr, jnp.clip(step / jnp.maximum(up_steps, 1e-8), 0.0, 1.0))
        down = _anneal(
            max_lr, min_lr, jnp.clip((step - up_steps) / jnp.maximum(down_steps, 1e-8), 0.0, 1.0)
        )
        return jnp.where(step <= up_steps, up, down)

    return schedule


@registry.register_lr_schedule("onecycle")
def onecycle_from_config(max_lr, total_steps, pct_start=0.3, **kw):
    return onecycle_schedule(max_lr, total_steps, pct_start=pct_start, **kw)


@registry.register_lr_schedule("linear_warmup_cosine_lr")
def linear_warmup_cosine(init_lr, min_lr, total_steps, warmup_steps=0, warmup_start_lr=-1.0):
    """LAVIS LinearWarmupCosineLRScheduler (optims.py:13-52): per-step linear
    warmup then cosine decay over steps."""
    warmup_start_lr = init_lr if warmup_start_lr < 0 else warmup_start_lr

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (init_lr - warmup_start_lr) * step / jnp.maximum(
            warmup_steps, 1
        )
        frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (init_lr - min_lr) * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


@registry.register_lr_schedule("linear_warmup_step_lr")
def linear_warmup_step(
    init_lr, min_lr, steps_per_epoch, decay_rate=1.0, warmup_steps=0, warmup_start_lr=-1.0
):
    """LAVIS LinearWarmupStepLRScheduler (optims.py:55-117): warmup then
    per-epoch exponential decay."""
    warmup_start_lr = init_lr if warmup_start_lr < 0 else warmup_start_lr

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr + (init_lr - warmup_start_lr) * step / jnp.maximum(
            warmup_steps, 1
        )
        epoch = jnp.floor(step / steps_per_epoch)
        stepped = jnp.maximum(init_lr * (decay_rate**epoch), min_lr)
        return jnp.where(step < warmup_steps, warm, stepped)

    return schedule
