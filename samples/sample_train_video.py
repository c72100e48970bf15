#!/usr/bin/env python
"""End-to-end video training loop: clip loader → sharded dp(×tp) train
step. The full production story in one file — deterministic shuffled
clip sampling, decode + fused preprocess into mesh-sharded batches, and
a jitted data-parallel training step consuming them.

Beyond-parity: the reference has no training at all (SURVEY.md §2.9);
its closest sample feeds a torch model one frame at a time
(samples/SampleTorchResnet.py:1095-1151). Clips train the bundled
VideoClassifier (per-frame backbone + temporal attention; each clip
labeled by its source file) — the plumbing, not the task, is the
point."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import time

import numpy as np

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_train_video")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="*", default=None)
    ap.add_argument("--clip-len", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--checkpoint", default=None, metavar="DIR",
                    help="preemption-safe training: save loader + model "
                    "+ optimizer state every --save-every steps; a rerun "
                    "with the same DIR resumes exactly")
    ap.add_argument("--save-every", type=int, default=2)
    ap.add_argument("--augment", action="store_true",
                    help="device-fused crop/flip/jitter augmentation "
                         "(ops/augment.py; deterministic + resume-exact)")
    ap.add_argument("--model", choices=("resnet", "vit"), default="resnet",
                    help="video model family: per-frame ResNet + temporal "
                         "head, or the factorized space-time VideoViT")
    ap.add_argument("--mixup", action="store_true",
                    help="batch-level MixUp/CutMix on device (soft "
                         "targets; ops.augment.mixup_cutmix)")
    args = ap.parse_args()
    sources = args.inputs or [default_input()]

    import jax
    import optax

    from videoprocessingframework_tpu.data import VideoClipLoader
    from videoprocessingframework_tpu.models import init_params
    from videoprocessingframework_tpu.parallel import make_mesh
    from videoprocessingframework_tpu.parallel.mesh import batch_sharding
    from videoprocessingframework_tpu.parallel.train import (
        make_train_step,
        shard_variables,
    )

    import math

    # the clip batch [B, T, H, W, C] shards its B dim over 'data', so
    # the mesh size must divide B — use the largest common divisor
    n_dev = math.gcd(len(jax.devices()), args.batch)
    mesh = make_mesh(n_dev, ("data", "model"), shape=(n_dev, 1))
    log.info("mesh: %d device(s) on 'data'", n_dev)

    aug_spec = None
    if args.augment:
        from videoprocessingframework_tpu.data import AugmentSpec

        aug_spec = AugmentSpec(
            crop=True, crop_scale=(0.5, 1.0), hflip=0.5,
            brightness=0.3, contrast=0.3, saturation=0.3,
        )
        log.info("augment: %s", aug_spec)

    loader = VideoClipLoader(
        sources,
        clip_len=args.clip_len,
        batch_size=args.batch,
        out_size=(args.size, args.size),
        output="rgb_f32",
        drop_last=True,
        sharding=batch_sharding(mesh),
        labels=list(range(len(sources))),  # clip label = source file
        seed=0,
        augment=aug_spec,
    )
    nclass = max(2, len(loader.corpus))
    log.info("corpus: %d file(s), %d clips/epoch", len(loader.corpus),
             loader.clips_per_epoch)

    if args.model == "vit":
        from videoprocessingframework_tpu.models import video_vit_tiny

        model = video_vit_tiny(num_classes=nclass)
    else:
        from videoprocessingframework_tpu.models import video_resnet18_like

        model = video_resnet18_like(num_classes=nclass)
    variables = shard_variables(
        mesh,
        init_params(model, (1, args.clip_len, args.size, args.size, 3)),
    )
    opt = optax.sgd(0.01, momentum=0.9)
    opt_state = opt.init(variables["params"])
    step = make_train_step(model, mesh, opt)

    # preemption-safe resume: model/optimizer via orbax, loader position
    # via its own state_dict (sampling is a pure fn of seed+epoch, so
    # the resumed run yields the exact remaining batch stream)
    import json

    done = 0
    ckdir = _pathlib.Path(args.checkpoint) if args.checkpoint else None
    if ckdir is not None and (ckdir / "meta.json").exists():
        from videoprocessingframework_tpu.models.checkpoint import (
            load_checkpoint,
        )

        meta = json.loads((ckdir / "meta.json").read_text())
        restored = load_checkpoint(
            str(ckdir / "model"),
            like={"variables": variables, "opt_state": opt_state},
        )
        variables = restored["variables"]
        opt_state = restored["opt_state"]
        loader.load_state_dict(meta["loader"])
        done = int(meta["step"])
        log.info("resumed at step %d (loader %s)", done, meta["loader"])

    def save(done):
        from videoprocessingframework_tpu.models.checkpoint import (
            save_checkpoint,
        )

        ckdir.mkdir(parents=True, exist_ok=True)
        save_checkpoint(
            str(ckdir / "model"),
            {"variables": variables, "opt_state": opt_state},
        )
        (ckdir / "meta.json").write_text(json.dumps(
            {"step": done, "loader": loader.state_dict()}
        ))

    t0 = time.perf_counter()
    metrics = {"loss": np.nan, "accuracy": np.nan}  # if already complete
    while done < args.steps:
        for batch, labels in loader.epoch():
            labels = labels.astype(np.int32) % nclass
            if args.mixup:
                from videoprocessingframework_tpu.ops.augment import (
                    mixup_cutmix,
                )

                batch, labels = mixup_cutmix(
                    batch, labels, jax.random.PRNGKey(done),
                    num_classes=nclass,
                )
            variables, opt_state, metrics = step(
                variables, opt_state,
                {"image": batch, "label": labels},
            )
            done += 1
            if ckdir is not None and done % args.save_every == 0:
                save(done)
            if done >= args.steps:
                break
        else:  # epoch exhausted without hitting the step budget
            loader.set_epoch(loader.state_dict()["epoch"] + 1)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    log.info(
        "trained %d steps (batch %dx%d frames) in %.2fs — final loss "
        "%.4f acc %.3f", done, args.batch, args.clip_len, dt,
        float(metrics["loss"]), float(metrics["accuracy"]),
    )
