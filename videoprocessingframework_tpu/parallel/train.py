"""Sharded execution: dp×tp train/infer steps over a jax Mesh.

Honest scope note: the reference has no training and no collectives at all
(SURVEY.md §2.9/§5.7) — its parallelism is stream-per-thread + one GPU per
object. This module is the *beyond-parity* scaling layer for the bundled
models: data-parallel over the ``data`` axis, tensor-parallel over
``model`` for the widest layers (classifier + final-stage channels), with
XLA inserting the psum/all-gather collectives. Pipeline/sequence/expert
parallelism don't apply to a per-frame vision pipeline; documented rather
than faked.
"""

from __future__ import annotations


from typing import Any, Callable, Tuple

import jax

import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P




def _param_spec(path: Tuple, leaf) -> P:
    """Sharding rule per parameter.

    Convolution kernels are (kh, kw, cin, cout) and Dense kernels are
    (cin, cout): shard the output-channel dim over ``model`` when it is
    large enough to split evenly; everything else replicates. This is the
    megatron-style column split — forward needs no collective until the
    consumer, and XLA all-gathers/reduces where required.
    """
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    if names and names[-1] == "kernel":
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def make_param_shardings(mesh: Mesh, params) -> Any:
    tp = mesh.shape.get("model", 1)

    def spec_for(path, leaf):
        s = _param_spec(path, leaf)
        # only shard when divisible; replicate otherwise
        if "model" in s and (leaf.shape[-1] % tp != 0 or leaf.shape[-1] < 2 * tp):
            s = P()
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_variables(mesh: Mesh, variables) -> Any:
    """Place a flax variable collection onto the mesh (params sharded,
    batch stats replicated)."""
    out = dict(variables)
    if "params" in out:
        shardings = make_param_shardings(mesh, out["params"])
        out["params"] = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), out["params"], shardings
        )
    for coll in ("batch_stats",):
        if coll in out:
            rep = NamedSharding(mesh, P())
            out[coll] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), out[coll]
            )
    return out


def make_train_step(
    model,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Build a jitted dp×tp train step.

    Inputs: (variables, opt_state, batch{'image' NHWC sharded on data,
    'label' N sharded on data}) → (variables, opt_state, metrics).
    Gradients are averaged across ``data`` implicitly by the global loss
    mean; batch-norm stats sync across ``data`` via the model's
    ``axis_name`` psum.
    """
    data_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def loss_fn(params, batch_stats, images, labels):
        # stat-less models (ViT/VideoViT — no batch norm) apply without
        # a mutable collection; the branch is on pytree STRUCTURE, so
        # it resolves at trace time and stays one compiled program
        if batch_stats is None:
            logits = model.apply({"params": params}, images, train=True)
            new_stats = None
        else:
            logits, new_state = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            new_stats = new_state["batch_stats"]
        if labels.ndim == 2:
            # soft targets (MixUp/CutMix output) — rank is static, so
            # this is still one compiled program per label kind
            loss = optax.softmax_cross_entropy(logits, labels).mean()
            acc = (logits.argmax(-1) == labels.argmax(-1)).mean()
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (logits.argmax(-1) == labels).mean()
        return loss, (new_stats, acc)

    def step(variables, opt_state, batch):
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, acc)), grads = grad_fn(
            params, batch_stats, batch["image"], batch["label"]
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "accuracy": acc}
        out_vars = {"params": params}
        if new_stats is not None:
            out_vars["batch_stats"] = new_stats
        return out_vars, opt_state, metrics

    # shard the batch over data; let XLA propagate the parameter shardings
    return jax.jit(
        step,
        in_shardings=(None, None, {"image": data_sharding, "label": data_sharding}),
        out_shardings=(None, None, rep),
    )


def make_infer_step(model, mesh: Mesh) -> Callable:
    """Data-parallel batched inference step over the mesh."""
    data_sharding = NamedSharding(mesh, P("data"))

    def infer(variables, images):
        return model.apply(variables, images, train=False)

    return jax.jit(infer, in_shardings=(None, data_sharding))
