"""Optimizer registry with torch-default hyperparameters.

The reference resolves optimizers by name on torch.optim
(training/training.py:429-433). We map the same names onto optax with
torch's default hyperparameters (notably AdamW weight_decay=0.01, not
optax's 1e-4). All optimizers are wrapped in inject_hyperparams so the
plateau scheduler can set the learning rate in-place without retracing.
"""

from __future__ import annotations

import optax


def _adamw(learning_rate, weight_decay=0.01, betas=(0.9, 0.999), eps=1e-8, **_):
    return optax.adamw(
        learning_rate, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    )


def _adam(learning_rate, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    if weight_decay:
        return optax.adamw(
            learning_rate, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay,
        )
    return optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)


def _sgd(learning_rate, momentum=0.0, weight_decay=0.0, nesterov=False, **_):
    tx = optax.sgd(learning_rate, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def _rmsprop(learning_rate, alpha=0.99, eps=1e-8, momentum=0.0, **_):
    return optax.rmsprop(
        learning_rate, decay=alpha, eps=eps, momentum=momentum or None
    )


def _adagrad(learning_rate, eps=1e-10, **_):
    return optax.adagrad(learning_rate, eps=eps)


_OPTIMIZERS = {
    "AdamW": _adamw,
    "Adam": _adam,
    "SGD": _sgd,
    "RMSprop": _rmsprop,
    "Adagrad": _adagrad,
}


def build_optimizer(name: str, lr: float, optimizer_args: dict | None):
    if name not in _OPTIMIZERS:
        raise ValueError(f"Unknown optimizer '{name}'; have {sorted(_OPTIMIZERS)}")
    factory = _OPTIMIZERS[name]

    def with_lr(learning_rate):
        return factory(learning_rate, **(optimizer_args or {}))

    return optax.inject_hyperparams(with_lr)(learning_rate=float(lr))


def set_learning_rate(opt_state, lr: float):
    """Functionally update the injected learning rate (no retrace: the lr is
    an array inside InjectHyperparamsState, not a compiled constant)."""
    import jax.numpy as jnp

    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
