"""Optimizers: torch class names from YAML -> optax transformation chains.

Parity note: the learning rate is NOT baked into the chain — the trainer
passes the current lr into the jitted step (supports every torch scheduler,
including metric-driven ReduceLROnPlateau, without retracing). torch-Adam
weight decay is L2-in-gradient (applied before the moment update); AdamW is
decoupled (applied after).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _scale_by_torch_rmsprop(alpha: float = 0.99, eps: float = 1e-8,
                            centered: bool = False
                            ) -> optax.GradientTransformation:
    """torch.optim.RMSprop scaling: ``sq = a*sq + (1-a)*g^2``,
    ``denom = sqrt(sq [- avg^2]) + eps`` (eps OUTSIDE the sqrt — optax's
    ``scale_by_rms`` default puts it inside)."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"sq": zeros,
                "avg": jax.tree.map(jnp.zeros_like, params) if centered
                else None}

    def update_fn(updates, state, params=None):
        del params
        sq = jax.tree.map(lambda g, s: alpha * s + (1 - alpha) * g * g,
                          updates, state["sq"])
        if centered:
            avg = jax.tree.map(lambda g, a: alpha * a + (1 - alpha) * g,
                               updates, state["avg"])
            denom = jax.tree.map(
                lambda s, a: jnp.sqrt(s - a * a) + eps, sq, avg)
        else:
            avg = None
            denom = jax.tree.map(lambda s: jnp.sqrt(s) + eps, sq)
        updates = jax.tree.map(lambda g, d: g / d, updates, denom)
        return updates, {"sq": sq, "avg": avg}

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_torch_adagrad(eps: float = 1e-10, lr_decay: float = 0.0,
                            initial_accumulator_value: float = 0.0
                            ) -> optax.GradientTransformation:
    """torch.optim.Adagrad scaling: ``sum += g^2``,
    ``update = g / (sqrt(sum) + eps) / (1 + (t-1)*lr_decay)``."""

    def init_fn(params):
        return {"sum": jax.tree.map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params),
            "count": jnp.zeros([], jnp.int32)}

    def update_fn(updates, state, params=None):
        del params
        count = state["count"] + 1
        acc = jax.tree.map(lambda g, s: s + g * g, updates, state["sum"])
        clr = 1.0 / (1.0 + (count - 1).astype(jnp.float32) * lr_decay)
        updates = jax.tree.map(
            lambda g, s: clr * g / (jnp.sqrt(s) + eps), updates, acc)
        return updates, {"sum": acc, "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_torch_adadelta(rho: float = 0.9, eps: float = 1e-6
                             ) -> optax.GradientTransformation:
    """torch.optim.Adadelta scaling: ``sq = rho*sq + (1-rho)*g^2``,
    ``d = g*sqrt(acc+eps)/sqrt(sq+eps)``, ``acc = rho*acc + (1-rho)*d^2``."""

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"sq": z, "acc": jax.tree.map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        del params
        sq = jax.tree.map(lambda g, s: rho * s + (1 - rho) * g * g,
                          updates, state["sq"])
        delta = jax.tree.map(
            lambda g, s, a: g * jnp.sqrt(a + eps) / jnp.sqrt(s + eps),
            updates, sq, state["acc"])
        acc = jax.tree.map(lambda d, a: rho * a + (1 - rho) * d * d,
                           delta, state["acc"])
        return delta, {"sq": sq, "acc": acc}

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_torch_adamax(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8
                           ) -> optax.GradientTransformation:
    """torch.optim.Adamax scaling: ``m = b1*m + (1-b1)*g``,
    ``u = max(b2*u, |g| + eps)``, ``update = m / ((1 - b1^t) * u)``."""

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"m": z, "u": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros([], jnp.int32)}

    def update_fn(updates, state, params=None):
        del params
        count = state["count"] + 1
        m = jax.tree.map(lambda g, m_: b1 * m_ + (1 - b1) * g,
                         updates, state["m"])
        u = jax.tree.map(lambda g, u_: jnp.maximum(b2 * u_, jnp.abs(g) + eps),
                         updates, state["u"])
        bc = 1.0 - b1 ** count.astype(jnp.float32)
        updates = jax.tree.map(lambda m_, u_: m_ / (bc * u_), m, u)
        return updates, {"m": m, "u": u, "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_torch_nadam(b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8, momentum_decay: float = 4e-3
                          ) -> optax.GradientTransformation:
    """torch.optim.NAdam scaling (single-tensor path): Nesterov momentum
    schedule ``mu_t = b1*(1 - 0.5*0.96^(t*psi))`` with the running
    ``mu_product``; update =
    ``((1-mu_t)/(1-mu_prod) * g + mu_{t+1}/(1-mu_prod*mu_{t+1}) * m) /
    (sqrt(v/(1-b2^t)) + eps)``."""

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return {"m": z, "v": jax.tree.map(jnp.zeros_like, params),
                "mu_product": jnp.ones([], jnp.float32),
                "count": jnp.zeros([], jnp.int32)}

    def update_fn(updates, state, params=None):
        del params
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        mu = b1 * (1.0 - 0.5 * 0.96 ** (t * momentum_decay))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((t + 1.0) * momentum_decay))
        mu_product = state["mu_product"] * mu
        m = jax.tree.map(lambda g, m_: b1 * m_ + (1 - b1) * g,
                         updates, state["m"])
        v = jax.tree.map(lambda g, v_: b2 * v_ + (1 - b2) * g * g,
                         updates, state["v"])
        bc2 = 1.0 - b2 ** t

        def upd(g, m_, v_):
            denom = jnp.sqrt(v_ / bc2) + eps
            return ((1.0 - mu) / (1.0 - mu_product) * g
                    + mu_next / (1.0 - mu_product * mu_next) * m_) / denom

        updates = jax.tree.map(upd, updates, m, v)
        return updates, {"m": m, "v": v, "mu_product": mu_product,
                         "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_torch_asgd(lr0: float, lambd: float = 1e-4,
                         alpha: float = 0.75
                         ) -> optax.GradientTransformation:
    """torch.optim.ASGD, reference-loop-effective semantics:
    ``delta_t = -eta_t * (g + lambd*p)`` with ``eta_1 = lr`` and
    ``eta_t = lr / (1 + lambd*lr*(t-1))**alpha`` (torch asgd.py
    _single_tensor_asgd: the eta used at step t is the value written at the
    end of step t-1; weight decay is added to g upstream, matching torch's
    order).

    The averaged iterate ``ax`` (and its ``mu``/``t0`` machinery) is
    deliberately not materialized: torch's ASGD steps the raw params
    identically with or without it, and the reference train loop
    (bin/train.py:379) never reads ``ax`` — it would only double optimizer
    memory. Because this trainer multiplies updates by the LIVE lr each
    step, updates are returned pre-divided by the YAML base lr; exact for a
    constant schedule, and a scheduler that changes lr mid-run scales eta's
    numerator but keeps the base lr in eta's denominator (documented in
    docs/MIGRATION.md).
    """

    def init_fn(params):
        del params
        return {"count": jnp.zeros([], jnp.int32)}

    def update_fn(updates, state, params=None):
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        # eta_t / lr: ratio form so the trainer's lr multiply reconstructs eta
        r = (1.0 + lambd * lr0 * (t - 1.0)) ** (-alpha)
        updates = jax.tree.map(lambda g, p: r * (g + lambd * p),
                               updates, params)
        return updates, {"count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_torch_rprop(lr0: float, etas=(0.5, 1.2),
                          step_sizes=(1e-6, 50.0)
                          ) -> optax.GradientTransformation:
    """torch.optim.Rprop: per-element step sizes, initialized at lr and
    multiplied by ``etaplus``/``etaminus`` on gradient-sign agreement/flip
    (clamped to ``step_sizes``); on a flip the update is suppressed and the
    stored previous gradient zeroed (torch rprop.py _single_tensor_rprop).

    torch's Rprop consumes lr ONLY as the step-size init; this trainer
    multiplies by the live lr each step, so updates are returned divided by
    the YAML base lr — exact for a constant schedule (a mid-run scheduler
    change would scale step sizes torch would leave untouched; documented
    in docs/MIGRATION.md).
    """
    etaminus, etaplus = etas
    smin, smax = step_sizes

    def init_fn(params):
        return {"prev": jax.tree.map(jnp.zeros_like, params),
                "step_size": jax.tree.map(
                    lambda p: jnp.full_like(p, lr0), params)}

    def update_fn(updates, state, params=None):
        del params
        sgn = jax.tree.map(lambda g, pr: jnp.sign(g * pr),
                           updates, state["prev"])
        step_size = jax.tree.map(
            lambda s, ss: jnp.clip(
                ss * jnp.where(s > 0, etaplus,
                               jnp.where(s < 0, etaminus, 1.0)),
                smin, smax),
            sgn, state["step_size"])
        g_mod = jax.tree.map(lambda s, g: jnp.where(s < 0, 0.0, g),
                             sgn, updates)
        new_updates = jax.tree.map(lambda g, ss: jnp.sign(g) * ss / lr0,
                                   g_mod, step_size)
        return new_updates, {"prev": g_mod, "step_size": step_size}

    return optax.GradientTransformation(init_fn, update_fn)


# torch.optim kwargs that are pure no-ops at their defaults (implementation
# switches or unimplemented-at-default features); a YAML ported verbatim
# from torch that spells these out must not crash (advisor round 3)
_NOOP_KWARG_DEFAULTS = {
    "amsgrad": False, "maximize": False, "foreach": None, "fused": None,
    "capturable": False, "differentiable": False, "decoupled_weight_decay":
    False,
}


def build_optimizer(name: str, params: dict | None = None,
                    grad_norm: float = -1) -> optax.GradientTransformation:
    """Build the lr-free part of the update: [clip] -> optimizer scaling.

    Accepts the torch.optim names the reference resolves from YAML
    (reference bin/train.py:1750-1759): Adam, RAdam, AdamW, NAdam, SGD,
    RMSprop, Adagrad, Adadelta, Adamax, ASGD, Rprop. The remaining two
    (LBFGS, SparseAdam) are provably dead in the reference's own train loop
    — see the error below and docs/MIGRATION.md.
    """
    params = dict(params or {})
    # lr is injected per-step by the trainer; ASGD/Rprop also consume the
    # base lr inside their update rule (eta schedule / step-size init)
    lr0 = params.pop("lr", 0.01)  # torch default for ASGD/Rprop
    # drop torch kwargs that are no-ops at their defaults; non-default
    # values still fall through to the loud rejection below
    for key in _NOOP_KWARG_DEFAULTS:
        if key in params and not params[key]:  # falsy == torch-default no-op
            params.pop(key)
    chain = []
    if grad_norm and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))

    # every branch POPS the keys it consumes; leftovers are rejected below
    # (torch.optim.<name> raises TypeError on unexpected kwargs too, and a
    # silently-ignored key — e.g. a typo'd "b1" instead of "betas", or an
    # unimplemented torch kwarg like amsgrad — would be a silent numerics
    # divergence from the YAML's intent)
    wd = params.pop("weight_decay", 1e-2 if name == "AdamW" else 0.0)
    if name in ("Adam", "RAdam"):
        b1, b2 = params.pop("betas", (0.9, 0.999))
        eps = params.pop("eps", 1e-8)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if name == "Adam":
            chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        else:
            chain.append(optax.scale_by_radam(b1=b1, b2=b2, eps=eps))
    elif name == "AdamW":
        b1, b2 = params.pop("betas", (0.9, 0.999))
        eps = params.pop("eps", 1e-8)
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        chain.append(optax.add_decayed_weights(wd))
    elif name == "SGD":
        momentum = params.pop("momentum", 0.0)
        nesterov = params.pop("nesterov", False)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    elif name == "RMSprop":
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(_scale_by_torch_rmsprop(
            alpha=params.pop("alpha", 0.99), eps=params.pop("eps", 1e-8),
            centered=params.pop("centered", False)))
        momentum = params.pop("momentum", 0.0)
        if momentum:
            chain.append(optax.trace(decay=momentum))
    elif name == "Adagrad":
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(_scale_by_torch_adagrad(
            eps=params.pop("eps", 1e-10),
            lr_decay=params.pop("lr_decay", 0.0),
            initial_accumulator_value=params.pop(
                "initial_accumulator_value", 0.0)))
    elif name == "Adadelta":
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(_scale_by_torch_adadelta(
            rho=params.pop("rho", 0.9), eps=params.pop("eps", 1e-6)))
    elif name == "Adamax":
        b1, b2 = params.pop("betas", (0.9, 0.999))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(_scale_by_torch_adamax(
            b1=b1, b2=b2, eps=params.pop("eps", 1e-8)))
    elif name == "NAdam":
        b1, b2 = params.pop("betas", (0.9, 0.999))
        # truthy only: a falsy value was already dropped as a no-op above
        decoupled = bool(params.pop("decoupled_weight_decay", False))
        if wd and not decoupled:  # torch default: L2-in-gradient
            chain.append(optax.add_decayed_weights(wd))
        chain.append(_scale_by_torch_nadam(
            b1=b1, b2=b2, eps=params.pop("eps", 1e-8),
            momentum_decay=params.pop("momentum_decay", 4e-3)))
        if wd and decoupled:  # AdamW-style, scaled by lr with the update
            chain.append(optax.add_decayed_weights(wd))
    elif name == "ASGD":
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        params.pop("t0", None)  # only shapes the never-read averaged iterate
        chain.append(_scale_by_torch_asgd(
            lr0, lambd=params.pop("lambd", 1e-4),
            alpha=params.pop("alpha", 0.75)))
    elif name == "Rprop":
        if wd:  # torch.optim.Rprop has no weight_decay kwarg at all
            raise TypeError(
                "Rprop got unexpected optimizer_params ['weight_decay'] — "
                "torch.optim.Rprop rejects it too.")
        chain.append(_scale_by_torch_rprop(
            lr0, etas=tuple(params.pop("etas", (0.5, 1.2))),
            step_sizes=tuple(params.pop("step_sizes", (1e-6, 50.0)))))
    elif name in ("LBFGS", "SparseAdam"):
        raise ValueError(
            f"{name} cannot run in the reference's own train loop either: "
            "LBFGS.step() requires a loss closure the loop never passes, and "
            "SparseAdam rejects the dense gradients every model here "
            "produces (reference bin/train.py:379/431 calls bare .step()) — "
            "a provably dead YAML name, refused here too (see "
            "docs/MIGRATION.md; tests/test_optim_sched_parity.py proves the "
            "torch-side failure).")
    else:
        raise ValueError(
            f"Unsupported optimizer: {name}. Supported torch names: Adam, "
            "RAdam, AdamW, NAdam, SGD, RMSprop, Adagrad, Adadelta, Adamax, "
            "ASGD, Rprop (see docs/MIGRATION.md).")
    if params:
        raise TypeError(
            f"{name} got unexpected optimizer_params {sorted(params)} — "
            "either a typo (e.g. 'b1'/'b2' instead of 'betas') or a torch "
            "kwarg this framework does not implement (see "
            "docs/MIGRATION.md); refusing to silently ignore it.")
    return optax.chain(*chain) if chain else optax.identity()
