"""Export a native .msgpack checkpoint as a reference-schema torch .tar.

The inverse of ``--pretrained_ckpt <lego.tar>``: a model trained in this
framework becomes loadable by the reference code's checkpoint path
(`/root/reference/main.py:482-502` reads ``network_fn_state_dict`` /
``network_fine_state_dict``; save schema per `main.py:1516-1542`).

  # student (R2L) checkpoint
  python tools/export_torch_ckpt.py --ckpt weights/ckpt_best.msgpack \
      --out lego.tar

  # teacher (NeRF) checkpoint (viewdirs inferred from the tree)
  python tools/export_torch_ckpt.py --ckpt weights/teacher.msgpack \
      --out teacher.tar --model_name nerf

The reference ALSO pickles the whole torch module into R2L tars
(``network_fn``, `main.py:1534-1536`); that pickle embeds their class
object and is not reproducible from outside their repo — consumers load
via the state_dict path, which this writes. The optimizer state is torch
Adam-specific and likewise not emitted (document in the meta key).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="native .msgpack checkpoint (trainer layout)")
    p.add_argument("--out", required=True, help="output .tar path")
    p.add_argument("--model_name", default="R2L",
                   choices=["R2L", "nerf"],
                   help="R2L student or NeRF teacher checkpoint "
                        "(viewdirs and fine-net presence are inferred "
                        "from the checkpoint tree)")
    p.add_argument("--linear_tail", action="store_true", default=False,
                   help="the student was trained with --linear_tail: "
                        "export the tail under the reference's "
                        "'tail.*' keys instead of 'tail.0.*' (shape-"
                        "identical, not inferable from the tree)")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    from r2l_tpu import checkpoint as ckpt

    raw, meta = ckpt.load_checkpoint(args.ckpt)
    blob = {"global_step": int(meta.get("global_step", 0)),
            "best_psnr": float(meta.get("best_psnr", -1.0)),
            "best_psnr_step": int(meta.get("best_psnr_step", -1))}

    def to_t(sd):
        return {k: torch.from_numpy(np.array(v, np.float32, copy=True))
                for k, v in sd.items()}

    # Restore msgpack trees against freshly initialized param targets
    # (from_state_dict rebuilds list structure from the stringified
    # index dicts) — the same path verify_released_ckpt.py uses, and it
    # covers every body architecture the init fns support.
    import jax
    from flax import serialization

    if args.model_name == "nerf":
        # teacher layout: {"coarse": ..., "fine": ..., ["opt_state"]}
        from r2l_tpu.models.nerf import NeRFConfig, init_nerf

        def cfg_of(tree):
            nl = sorted(int(k) for k in tree["pts_linears"])
            vd = "alpha_linear" in tree
            return NeRFConfig(D=len(nl), W=int(np.asarray(
                tree["pts_linears"]["0"]["w"]).shape[1]),
                use_viewdirs=vd,
                input_ch=int(np.asarray(
                    tree["pts_linears"]["0"]["w"]).shape[0]))

        def restore_nerf(tree):
            cfg = cfg_of(tree)
            target = init_nerf(jax.random.key(0), cfg)
            return serialization.from_state_dict(target, tree), cfg

        coarse, ccfg = restore_nerf(raw["coarse"])
        blob["network_fn_state_dict"] = to_t(
            ckpt.params_to_torch_nerf(coarse, ccfg))
        if raw.get("fine"):
            fine, fcfg = restore_nerf(raw["fine"])
            blob["network_fine_state_dict"] = to_t(
                ckpt.params_to_torch_nerf(fine, fcfg))
    else:
        from r2l_tpu.models.r2l import init_r2l
        params = raw["params"] if isinstance(raw, dict) and "params" in raw \
            else raw
        cfg = ckpt.infer_r2l_config_from_params(
            params, linear_tail=args.linear_tail)
        target = init_r2l(jax.random.key(0), cfg)
        restored = serialization.from_state_dict(target, params)
        blob["network_fn_state_dict"] = to_t(
            ckpt.params_to_torch_r2l(restored, cfg))
    n_par = sum(int(np.asarray(v).size)
                for key in ("network_fn_state_dict",
                            "network_fine_state_dict")
                for v in blob.get(key, {}).values())

    blob["note"] = ("exported from a native r2l_tpu checkpoint; "
                    "optimizer state / pickled module omitted "
                    "(torch-specific in the reference)")
    torch.save(blob, args.out)
    print(f"wrote {args.out}: {n_par/1e6:.2f}M params, "
          f"global_step {blob['global_step']}, "
          f"best_psnr {blob['best_psnr']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
