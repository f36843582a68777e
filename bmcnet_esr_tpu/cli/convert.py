"""Checkpoint conversion CLI, both directions.

Import (reference ``.pth`` -> framework param tree):

    python -m bmcnet_esr_tpu.cli.convert \
        --pth pretrain/BMCNet_plain_nfs_x4.pth --variant plain --scale 4 \
        --out converted/plain_nfs_x4 [--npz]

Export (trained framework checkpoint -> reference-layout ``.pth``, every
tied alias re-expanded so the torch implementation loads it unchanged):

    python -m bmcnet_esr_tpu.cli.convert \
        --from_ckpt runs/exp/save/iteration_100000 --variant full \
        --n_b 5 --out exported/bmcnet_x4.pth

LPIPS bundle (``.pth`` pair -> one torch-free ``.npz`` the training-recipe
LPIPS term loads without importing torch, ``training/losses.py``):

    python -m bmcnet_esr_tpu.cli.convert \
        --lpips_backbone alexnet_features.pth \
        --lpips_lin weights/v0.1/alex.pth --net alex --out lpips_alex.npz

Verifies tied aliases bit-match during dedupe and reports the unique
parameter count; imported output loads via ``--model_path`` in the infer
CLI or as initial weights for fine-tuning.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="convert checkpoints to/from the reference layout")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pth", help="import: reference .pth checkpoint")
    src.add_argument("--from_ckpt", help="export: framework checkpoint (.npz or orbax dir)")
    src.add_argument(
        "--lpips_backbone",
        help="convert an LPIPS .pth pair to one torch-free .npz bundle",
    )
    p.add_argument("--lpips_lin", help="LPIPS linear-head .pth (with --lpips_backbone)")
    p.add_argument("--net", default="alex", choices=["alex", "vgg", "vgg16", "squeeze"])
    p.add_argument("--version", default="0.1", choices=["0.0", "0.1"])
    p.add_argument("--out", required=True)
    p.add_argument("--variant", default="full", choices=["full", "plain"])
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--n_c", type=int, default=128)
    p.add_argument("--n_b", type=int, default=5)
    p.add_argument("--npz", action="store_true", help="write a flat .npz instead of orbax")
    args = p.parse_args(argv)

    if args.lpips_backbone:
        return _export_lpips(args)
    if args.from_ckpt:
        return _export(args)

    import numpy as np
    import jax
    jax.config.update("jax_platform_name", "cpu")  # conversion is host work
    import jax.numpy as jnp

    from bmcnet_esr_tpu.models import BMCNet, BMCNetPlain, load_torch_checkpoint
    from bmcnet_esr_tpu.models.convert import validate_against

    variables = load_torch_checkpoint(args.pth)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables))
    print(f"converted {args.pth}: {n} unique params")

    cls = BMCNetPlain if args.variant == "plain" else BMCNet
    model = cls(scale=args.scale, n_c=args.n_c, n_b=args.n_b)
    dummy = jnp.zeros((1, 2, 8, 8, 2))
    ref = model.init(jax.random.key(0), dummy, *model.init_state(1, 8, 8))
    validate_against(variables, ref)
    print("structure validated against", cls.__name__)

    if args.npz:
        flat = {
            "/".join(str(k.key) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_leaves_with_path(variables)
        }
        np.savez_compressed(args.out if args.out.endswith(".npz") else args.out + ".npz", **flat)
        print("wrote", args.out)
    else:
        import orbax.checkpoint as ocp

        path = os.path.abspath(args.out)
        ocp.StandardCheckpointer().save(path, jax.device_get(variables))
        print("wrote orbax checkpoint:", path)


def _export(args):
    import numpy as np
    import jax
    jax.config.update("jax_platform_name", "cpu")
    import torch

    from bmcnet_esr_tpu.inference.engine import load_model_for_inference
    from bmcnet_esr_tpu.models import export_torch_state_dict

    _, variables = load_model_for_inference(
        args.from_ckpt, args.scale, args.n_c, args.n_b, args.variant
    )
    sd = export_torch_state_dict(variables, args.variant, n_b=args.n_b)
    out = args.out if args.out.endswith(".pth") else args.out + ".pth"
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, out)
    n_unique = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables))
    print(f"exported {len(sd)} torch keys ({n_unique} unique params) -> {out}")


def _export_lpips(args):
    import jax
    jax.config.update("jax_platform_name", "cpu")
    import torch

    from bmcnet_esr_tpu.losses.lpips import LPIPS

    backbone_sd = {
        k: v.numpy()
        for k, v in torch.load(
            args.lpips_backbone, map_location="cpu", weights_only=True
        ).items()
    }
    lp = LPIPS.from_torch(
        backbone_sd, args.lpips_lin, args.net, version=args.version,
        lpips=args.lpips_lin is not None,
    )
    out = args.out if args.out.endswith(".npz") else args.out + ".npz"
    lp.to_npz(out)
    print(f"wrote torch-free LPIPS bundle ({args.net} v{args.version}): {out}")


if __name__ == "__main__":
    main()
