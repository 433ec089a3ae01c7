"""Minimal HTTP serving demo around ladine_tpu.infer.Predictor.

POST /predict returns {"probs": ..., "majority_vote": ..., "piw": ...,
"mc_variance": ...}. Two request encodings:

- JSON: {"images": [[...BxHxWx3 floats in [0,1]...]]} — easy to poke by
  hand, but a 224x224x3 image is ~1.5 MB of decimal text.
- binary (Content-Type: application/octet-stream): the body is one .npy
  array, BxHxWx3, float32 in [0,1] or uint8 0..255 (divided by 255
  server-side) — 4x smaller again as uint8, and zero parse cost:
      np.save(buf, batch); requests.post(url, data=buf.getvalue(),
              headers={"Content-Type": "application/octet-stream"})
  Send "Accept: application/octet-stream" to get the outputs back as one
  .npz instead of JSON.

GET /health returns the artifact geometry.

    python examples/serve_http.py --artifact ./artifact --port 8787
    python examples/serve_http.py --demo --port 8787   # random tiny artifact

(stdlib http.server: a demonstration of the artifact contract, not a
production server — front it with a real ASGI stack for deployment.)
"""

import argparse
import json
import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_demo_predictor(mesh=None, **overrides):
    """``overrides``: Predictor constructor knobs — e.g. a PRESETS dict, so
    --preset applies to the demo predictor too instead of being silently
    ignored."""
    import jax
    import jax.numpy as jnp

    from ladine_tpu.infer import Predictor, stack_members
    from ladine_tpu.models import ConditionalModel, SEViTGuidance
    from ladine_tpu.ops import DiffusionSchedule

    g = SEViTGuidance(num_classes=2, num_members=3, vit_depth=3, img_size=16,
                      patch_size=8, embed_dim=16, num_heads=2, mlp_hidden_dims=(16, 8, 8))
    gv = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    m = ConditionalModel(data_dim=768, feature_dim=8, hidden_dim=8, y_dim=2, n_steps=101)
    members = [m.init(jax.random.PRNGKey(i), jnp.zeros((1, 768)), jnp.zeros((1, 2)),
                      jnp.asarray(0), jnp.full((1, 2), 0.5)) for i in range(3)]
    kwargs = dict(mc_trials=4, ddim_steps=10)
    kwargs.update(overrides)
    return Predictor(guidance=g, guidance_vars=gv, model=m,
                     stacked_vars=stack_members(members),
                     sched=DiffusionSchedule.create("linear", 100),
                     mesh=mesh, **kwargs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", type=str, default=None)
    ap.add_argument("--bundle", type=str, default=None,
                    help="serve an AOT deployment bundle "
                         "(Predictor.export_serving) instead of a live "
                         "artifact — no tracing, fixed batch shapes; the "
                         "bundle must carry every MicroBatcher bucket up "
                         "to --max_batch")
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max_batch", type=int, default=70,
                    help="micro-batch cap: concurrent requests coalesce into "
                         "one device call up to this many images")
    ap.add_argument("--max_wait_ms", type=float, default=10.0,
                    help="how long a lone request lingers for co-riders")
    ap.add_argument("--mesh", action="store_true",
                    help="serve over ALL visible devices: member-sharded "
                         "ensemble + data-sharded request batches "
                         "(('member','data') mesh, infer/serve.py)")
    ap.add_argument("--preset", type=str, default=None,
                    choices=["parity", "serving", "fast"],
                    help="named sampler/quantization operating point "
                         "(infer/serve.py PRESETS); default: the artifact's "
                         "saved settings")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ladine_tpu.infer import Predictor

    if args.mesh:
        from ladine_tpu.parallel import make_mesh
    if args.bundle:
        from ladine_tpu.infer import ExportedPredictor, MicroBatcher as MB

        if args.mesh or args.preset:
            ap.error("--bundle serves the exported program as-is; "
                     "re-export with the desired preset / use a live "
                     "artifact for mesh serving")
        predictor = ExportedPredictor.load(args.bundle)
        missing = [b for b in MB.bucket_sizes(args.max_batch)
                   if b not in predictor.programs]
        if missing:
            ap.error(f"bundle lacks programs for batcher buckets {missing} "
                     f"at --max_batch {args.max_batch}; re-export with "
                     f"batch_sizes=MicroBatcher.bucket_sizes({args.max_batch})"
                     f" or lower --max_batch")
    elif args.demo:
        from ladine_tpu.infer.serve import PRESETS

        mesh = make_mesh(len(jax.devices()), num_members=3) if args.mesh else None
        predictor = build_demo_predictor(
            mesh=mesh, **(PRESETS[args.preset] if args.preset else {}))
    elif args.artifact:
        mesh = None
        if args.mesh:
            # size the member axis from the STACKED ensemble actually saved —
            # a partial-member artifact (--mlp_idx export) stacks fewer
            # members than the guidance has heads
            from ladine_tpu.utils.checkpoint import load_checkpoint_meta

            meta = load_checkpoint_meta(args.artifact)
            if not meta:
                ap.error(f"no predictor artifact at {args.artifact} "
                         "(ladine_meta.json missing)")
            if "guidance" not in meta:
                ap.error(f"{args.artifact} is not a predictor artifact "
                         f"(kind: {meta.get('kind', 'unknown')})")
            hi = meta.get("head_indices")
            n_members = len(hi) if hi else meta["guidance"]["num_members"]
            mesh = make_mesh(len(jax.devices()), num_members=n_members)
        predictor = Predictor.load(args.artifact, preset=args.preset, mesh=mesh)
    else:
        ap.error("pass --artifact PATH, --bundle PATH, or --demo")
    size = (predictor.img_size if args.bundle
            else predictor.guidance.img_size)
    # concurrent requests coalesce into one device call (fixed dispatch cost
    # ~43 ms/batch amortizes across co-riders; see infer/batching.py)
    from ladine_tpu.infer import MicroBatcher

    batcher = MicroBatcher(predictor.predict, max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms)

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                if args.bundle:
                    info = {"kind": "aot_bundle",
                            "batch_sizes": sorted(predictor.programs),
                            **predictor.settings}
                else:
                    info = {"members": int(predictor.guidance.num_members),
                            "mc_trials": predictor.mc_trials,
                            "ddim_steps": predictor.ddim_steps}
                self._json(200, {"status": "ok", "image_size": size,
                                 **info, "batching": batcher.stats()})
            else:
                self._json(404, {"error": "GET /health or POST /predict"})

        def _npz(self, out):
            import io

            buf = io.BytesIO()
            np.savez(buf, **out)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/predict":
                return self._json(404, {"error": "POST /predict"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "application/json")
                if ctype.startswith("application/octet-stream"):
                    import io

                    images = np.load(io.BytesIO(body), allow_pickle=False)
                    if not isinstance(images, np.ndarray):
                        # e.g. an .npz posted back (the response format)
                        raise ValueError(
                            "binary body must be a single .npy array, got "
                            f"{type(images).__name__}")
                    if images.dtype.kind == "u":
                        # unsigned payloads normalize by their dtype's max
                        # (uint8 -> /255, uint16 medical scans -> /65535);
                        # raw 0..max floats would saturate the model
                        images = (images.astype(np.float32)
                                  / float(np.iinfo(images.dtype).max))
                    elif images.dtype.kind == "f":
                        images = np.asarray(images, np.float32)
                    else:
                        # signed ints (raw CT ranges etc.) have no obvious
                        # normalization — make the client pick one
                        raise ValueError(
                            f"dtype {images.dtype} not supported: send "
                            "float in [0,1] or unsigned int")
                else:
                    images = np.asarray(json.loads(body)["images"], np.float32)
                out = batcher.predict(images)
                if "application/octet-stream" in self.headers.get("Accept", ""):
                    self._npz(out)
                else:
                    self._json(200, {k: v.tolist() for k, v in out.items()})
            except (KeyError, TypeError, ValueError, OSError,
                    zipfile.BadZipFile, json.JSONDecodeError) as e:
                # BadZipFile/OSError: np.load on corrupt zip-magic bodies
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):
            print(f"[serve] {self.address_string()} {a[0] % a[1:]}", file=sys.stderr)

    server = ThreadingHTTPServer(("127.0.0.1", args.port), Handler)
    print(f"[serve] listening on 127.0.0.1:{args.port} (img {size}x{size})",
          file=sys.stderr)
    server.serve_forever()


if __name__ == "__main__":
    main()
