"""Export an AOT serving bundle from a saved predictor artifact.

    python -m ladine_tpu.cli.export_bundle \
        --artifact ./exp/logs/run/predictor_artifact --out ./bundle \
        --preset fast --max_batch 70

Writes serialized StableHLO programs (one per MicroBatcher bucket up to
--max_batch, or the explicit --batch_sizes) plus the run weight trees —
see Predictor.export_serving. The bundle is platform-locked: run this on
the platform you deploy to (--cpu forces the CPU backend for local tests).

The reference has no deployment story (its inference exists only inside
the evaluation loop, classification_train_separately.py:675-781); this is
the TPU-native one.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifact", type=str, required=True,
                    help="saved Predictor artifact (Predictor.save / "
                         "--export_predictor)")
    ap.add_argument("--out", type=str, required=True, help="bundle dir")
    ap.add_argument("--preset", type=str, default=None,
                    choices=["parity", "serving", "fast"],
                    help="operating point to bake into the exported program")
    ap.add_argument("--dtype", type=str, default="artifact",
                    choices=["artifact", "bfloat16", "float32"],
                    help="compute dtype for the exported program")
    ap.add_argument("--max_batch", type=int, default=70,
                    help="export every MicroBatcher bucket up to this cap")
    ap.add_argument("--batch_sizes", type=int, nargs="*", default=None,
                    help="explicit batch sizes (overrides --max_batch)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ladine_tpu.infer import MicroBatcher, Predictor

    sizes = (tuple(args.batch_sizes) if args.batch_sizes
             else tuple(MicroBatcher.bucket_sizes(args.max_batch)))
    dtype = None if args.dtype == "artifact" else args.dtype
    predictor = Predictor.load(
        args.artifact, preset=args.preset,
        **({} if dtype is None else {"dtype": dtype}))
    predictor.export_serving(args.out, batch_sizes=sizes)
    print(f"exported {len(sizes)} programs (batch sizes {list(sizes)}, "
          f"platform {jax.devices()[0].platform}) -> {args.out}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
