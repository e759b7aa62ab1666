"""SOAP (ShampoO with Adam in the Preconditioner's eigenbasis), optax-style.

Functional JAX re-implementation of the algorithm in the reference
(``src/training/optimizers/soap/__init__.py``, paper arXiv:2409.11321):

* per-dimension GG outer-product EMAs for every axis of size
  <= max_precond_dim (``init_preconditioner``/``update_preconditioner``,
  ``:236-271,301-355``);
* gradients projected into the GG eigenbasis, Adam moments maintained there
  (first moment on the raw grad, second on the projected grad — reference
  ``:171-183``), update projected back (``:200-207``);
* eigenbasis init via eigh (``get_orthogonal_matrix``, ``:384-421``),
  periodic refresh via one power-iteration + QR with eigenvalue-sorted
  re-indexing of exp_avg_sq (``get_orthogonal_matrix_QR``, ``:423-480``),
  every ``precondition_frequency`` steps under ``lax.cond`` so only the taken
  branch executes on device;
* first step only installs the preconditioner, no param update (``:160``);
* decoupled weight decay ``p -= lr*wd*p`` (``:222-223``).

All preconditioner math runs fp32.  Axes larger than ``max_precond_dim`` are
represented by shape-(0,0) placeholder matrices (static shapes keep the whole
update jittable).  ``merge_dims`` reshapes tensors so adjacent axes whose
product fits in ``max_precond_dim`` share a preconditioner (``:80-107``).
Layouts are HWIO/channels-last throughout this framework, so the reference's
``data_format`` permutation is unnecessary.

Compile scalability (``stack_leaves=True``, the default): same-shape leaves
are transiently stacked and the per-leaf update is ``jax.vmap``-ed over the
stack, so the eigh/QR/tensordot bodies appear once per distinct shape
(~60 for the SDXL UNet) instead of once per leaf (~1,700) — the unrolled
HLO OOM-killed real compilers at full scale.  State structure and numerics
are identical to the unrolled form.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import chex
import jax
import jax.numpy as jnp
import optax


def _merged_shape(shape: Tuple[int, ...], max_dim: int) -> Tuple[int, ...]:
    """Merge adjacent dims while the running product stays <= max_dim
    (reference ``merge_dims``, ``:80-107``)."""
    new_shape = []
    curr = 1
    for sh in shape:
        temp = curr * sh
        if temp > max_dim:
            if curr > 1:
                new_shape.append(curr)
                curr = sh
            else:
                new_shape.append(sh)
                curr = 1
        else:
            curr = temp
    if curr > 1 or not new_shape:
        new_shape.append(curr)
    return tuple(new_shape)


def _precond_shape(shape: Tuple[int, ...], max_dim: int,
                   precondition_1d: bool) -> Tuple[int, ...]:
    """Size of the preconditioner for each (possibly merged) axis; 0 = skip."""
    if len(shape) == 0:
        return ()
    if len(shape) == 1:
        ok = precondition_1d and shape[0] <= max_dim
        return (shape[0] if ok else 0,)
    return tuple(sh if sh <= max_dim else 0 for sh in shape)


class SOAPState(NamedTuple):
    step: chex.Array
    exp_avg: chex.ArrayTree
    exp_avg_sq: chex.ArrayTree  # lives in the projected space
    gg: chex.ArrayTree          # tuple-of-matrices per leaf
    q: chex.ArrayTree           # tuple-of-eigenbases per leaf


def soap(lr: float = 3e-3, betas=(0.95, 0.95), shampoo_beta: float = -1,
         eps: float = 1e-8, weight_decay: float = 0.01,
         precondition_frequency: int = 10, max_precond_dim: int = 10000,
         merge_dims: bool = False, precondition_1d: bool = False,
         normalize_grads: bool = False, correct_bias: bool = True,
         data_format: str = "channels_last",
         stack_leaves: bool = True) -> optax.GradientTransformation:
    beta1, beta2 = betas
    sh_beta = shampoo_beta if shampoo_beta >= 0 else beta2

    def leaf_shape(p):
        s = p.shape
        return _merged_shape(s, max_precond_dim) if merge_dims else s

    def init(params):
        def gg_init(p):
            ps = _precond_shape(leaf_shape(p), max_precond_dim, precondition_1d)
            return tuple(jnp.zeros((d, d), jnp.float32) for d in ps)

        return SOAPState(
            step=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            exp_avg_sq=jax.tree.map(
                lambda p: jnp.zeros(leaf_shape(p), jnp.float32), params),
            gg=jax.tree.map(gg_init, params),
            q=jax.tree.map(gg_init, params),  # same shapes; orthogonalized on 1st step
        )

    def _project(g, q_mats):
        """Rotate into the eigenbasis: sequential contraction over dim 0
        (skipped dims cycle to the back), reference ``project`` ``:273-299``."""
        for mat in q_mats:
            if mat.shape[0] > 0:
                g = jnp.tensordot(g, mat.astype(g.dtype), axes=[[0], [0]])
            else:
                g = jnp.moveaxis(g, 0, -1)
        return g

    def _project_back(g, q_mats):
        for mat in q_mats:
            if mat.shape[0] > 0:
                g = jnp.tensordot(g, mat.astype(g.dtype), axes=[[0], [1]])
            else:
                g = jnp.moveaxis(g, 0, -1)
        return g

    def _update_gg(g, gg):
        new = []
        for idx, mat in enumerate(gg):
            if mat.shape[0] == 0:
                new.append(mat)
                continue
            axes = [i for i in range(g.ndim) if i != idx]
            outer = jnp.tensordot(g, g, axes=(axes, axes))
            new.append(mat * sh_beta + outer * (1.0 - sh_beta))
        return tuple(new)

    def _eigh_q(gg):
        out = []
        for mat in gg:
            if mat.shape[0] == 0:
                out.append(mat)
                continue
            reg = mat + 1e-30 * jnp.eye(mat.shape[0], dtype=mat.dtype)
            _, qm = jnp.linalg.eigh(reg)
            out.append(jnp.flip(qm, axis=1))
        return tuple(out)

    def _qr_refresh(gg, q, exp_avg_sq):
        """Power iteration + QR, sorting exp_avg_sq by estimated eigenvalues
        (reference ``get_orthogonal_matrix_QR``, ``:423-480``)."""
        new_q = []
        v = exp_avg_sq
        for ind, (mat, o) in enumerate(zip(gg, q)):
            if mat.shape[0] == 0:
                new_q.append(o)
                continue
            est_eig = jnp.diagonal(o.T @ mat @ o)
            sort_idx = jnp.argsort(est_eig)[::-1]
            v = jnp.take(v, sort_idx, axis=ind)
            o = o[:, sort_idx]
            power_iter = mat @ o
            qm, _ = jnp.linalg.qr(power_iter)
            new_q.append(qm)
        return tuple(new_q), v

    def update(grads, state, params):
        if params is None:
            raise ValueError("soap requires params")
        step = state.step + 1  # 1-based; step 1 = preconditioner install only
        is_first = state.step == 0

        def leaf(p, g, m, v, gg, q):
            g32 = g.astype(jnp.float32)
            gm = g32.reshape(leaf_shape(p)) if merge_dims else g32
            gg = _update_gg(gm, gg)

            def first_branch(_):
                # install eigenbasis, no update (reference ``:160``)
                return (jnp.zeros_like(p), m, v, gg, _eigh_q(gg))

            def adam_branch(_):
                g_proj = _project(gm, q)
                m_new = beta1 * m + (1.0 - beta1) * g32
                v_new = beta2 * v + (1.0 - beta2) * g_proj * g_proj
                denom = jnp.sqrt(v_new) + eps
                m_merged = m_new.reshape(leaf_shape(p)) if merge_dims else m_new
                m_proj = _project(m_merged, q)
                norm_grad = _project_back(m_proj / denom, q)
                if merge_dims:
                    norm_grad = norm_grad.reshape(p.shape)
                if normalize_grads:
                    norm_grad = norm_grad / (
                        1e-30 + jnp.sqrt(jnp.mean(norm_grad ** 2)))
                step_size = lr
                if correct_bias:
                    sf = step.astype(jnp.float32)
                    step_size = lr * jnp.sqrt(1.0 - beta2 ** sf) / (1.0 - beta1 ** sf)
                delta = (-step_size * norm_grad
                         - lr * weight_decay * p.astype(jnp.float32))
                # periodic eigenbasis refresh (post-update, reference ``:226-232``)
                do_refresh = (step % precondition_frequency) == 0
                q_new, v_sorted = jax.lax.cond(
                    do_refresh,
                    lambda _: _qr_refresh(gg, q, v_new),
                    lambda _: (q, v_new),
                    operand=None)
                return (delta.astype(p.dtype), m_new, v_sorted, gg, q_new)

            return jax.lax.cond(is_first, first_branch, adam_branch, None)

        # explicit flatten/unflatten: leaf results mix arrays and tuples of
        # matrices, which tree.map cannot re-zip safely
        p_leaves, treedef = jax.tree_util.tree_flatten(params)
        flat = lambda t: treedef.flatten_up_to(t)
        inputs = list(zip(
            p_leaves, flat(grads), flat(state.exp_avg), flat(state.exp_avg_sq),
            flat(state.gg), flat(state.q)))
        if stack_leaves:
            # Compile scalability: a 2.6B-param UNet has ~1,700 leaves; the
            # unrolled program repeats the eigh/QR/tensordot bodies per leaf
            # and the resulting HLO OOMs real compilers.  Same-shape leaves
            # share one vmapped body instead (the cond predicates `is_first`
            # and `do_refresh` are unbatched scalars, so vmap keeps both
            # lax.conds as conds — the refresh branch still only executes on
            # refresh steps).  Numerics per leaf are unchanged; only HLO
            # structure differs.
            groups: dict = {}
            for i, p in enumerate(p_leaves):
                groups.setdefault((p.shape, str(p.dtype)), []).append(i)
            results: list = [None] * len(inputs)
            vleaf = jax.vmap(leaf)
            for key in sorted(groups, key=str):
                idxs = groups[key]
                if len(idxs) == 1:
                    results[idxs[0]] = leaf(*inputs[idxs[0]])
                    continue
                stacked = jax.tree.map(
                    lambda *ls: jnp.stack(ls), *[inputs[i] for i in idxs])
                out = vleaf(*stacked)
                for j, i in enumerate(idxs):
                    results[i] = jax.tree.map(lambda a: a[j], out)
        else:
            results = [leaf(*args) for args in inputs]
        pick = lambda i: jax.tree_util.tree_unflatten(
            treedef, [r[i] for r in results])
        new_state = SOAPState(step=step, exp_avg=pick(1), exp_avg_sq=pick(2),
                              gg=pick(3), q=pick(4))
        return pick(0), new_state

    return optax.GradientTransformation(init, update)
