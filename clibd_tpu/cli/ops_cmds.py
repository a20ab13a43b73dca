"""Operational commands: resident serving, deployment doctor, config
listing, the throughput microbenchmark."""

from __future__ import annotations

import json
import os
import sys


from .common import _dataset_hdf5_path, _load_cfg, _resolve_params, _checkpoint_candidates, _resolve_params_local


def cmd_serve(args, overrides) -> int:
    """Resident inference server (engine/serve.py): loads the checkpoint
    once, pre-compiles the bucketed forward programs, then serves
    /embed + /search over HTTP with micro-batched device calls."""
    cfg = _load_cfg(args, overrides)

    from ..engine.serve import InferenceService, make_server

    mc = cfg.model_config
    params = _resolve_params(cfg)
    # derive the image geometry from the checkpoint's image tower (pre_warm
    # would crash at startup on a mismatch, but derive rather than assume 224)
    image_size = (mc.clip.image_size if mc.backbone == "open_clip"
                  else mc.image.vit.image_size)
    keys_mesh = None
    if args.shard_keys:
        from ..parallel.mesh import local_mesh

        keys_mesh = local_mesh()
    service = InferenceService(
        params, mc, keys_path=args.keys,
        buckets=tuple(b for b in (1, 2, 4, 8, 16, 32) if b <= args.max_batch),
        window_ms=args.window_ms, max_batch=args.max_batch,
        image_size=image_size, resize_to=round(image_size * 256 / 224),
        keys_mesh=keys_mesh, keys_dtype=args.keys_dtype,
        keys_rerank=args.keys_rerank, keys_selector=args.keys_selector,
        language_vocab=args.language_vocab,
        text_max_len=mc.language.max_len, max_queue=args.max_queue)
    if not args.no_warm:
        print("compiling bucketed forward programs ...", flush=True)
        service.pre_warm()
    if args.reload_watch > 0:
        if not args.keys:
            print("--reload-watch needs --keys", file=sys.stderr)
            return 2
        service.start_reload_watch(args.reload_watch)
    server = make_server(service, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(keys: {service.keys.n if service.keys else 'none'})", flush=True)

    # SIGTERM (the orchestrator's stop signal) → the same clean-exit path
    # as Ctrl-C: raise in the main thread, which is inside serve_forever
    import signal

    def _terminate(signum, frame):
        raise KeyboardInterrupt

    prev_handler = signal.signal(signal.SIGTERM, _terminate)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        signal.signal(signal.SIGTERM, prev_handler)
        server.shutdown()
        server.server_close()
        service.close()
    return 0


def cmd_doctor(args, overrides) -> int:
    """Deployment diagnostic: device reachability (WITH a timeout — a dead
    tunnel hangs jax.devices() forever), native decoder availability,
    multi-host identity, and optionally config/dataset/checkpoint
    resolution for an experiment.  One JSON object; rc 1 if any check
    fails."""
    import importlib.metadata
    import sys as _sys
    import threading

    report: dict = {"python": _sys.version.split()[0]}
    try:
        report["jax"] = importlib.metadata.version("jax")
    except importlib.metadata.PackageNotFoundError:
        report["jax"] = None

    # -- device probe in a daemon thread so an unreachable backend can't
    # hang the diagnostic (observed: tunnel outages block jax.devices())
    probe: dict = {}

    def _probe():
        import time as _time

        import numpy as np

        import jax
        import jax.numpy as jnp

        from ..parallel.mesh import _MULTIHOST_ENV_HINTS, maybe_initialize_distributed

        t0 = _time.perf_counter()
        probe["distributed_hints"] = {
            k: os.environ[k] for k in _MULTIHOST_ENV_HINTS if os.environ.get(k)}
        # the exact sequence every other subcommand runs at startup —
        # rendezvous first, then backend
        probe["distributed"] = maybe_initialize_distributed()
        devs = jax.devices()
        probe["platform"] = devs[0].platform
        probe["device_count"] = len(devs)
        probe["process_index"] = jax.process_index()
        probe["process_count"] = jax.process_count()
        x = jnp.ones((256, 256))
        float(np.asarray((x @ x).sum()))  # force a real device round-trip
        probe["device_roundtrip_s"] = round(_time.perf_counter() - t0, 3)

    def _probe_guarded():
        try:
            _probe()
        except Exception as e:  # surface the failure IN the report
            probe["exception"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=_probe_guarded, daemon=True)
    t.start()
    t.join(timeout=args.timeout)
    # keep whatever the probe recorded before hanging/failing — e.g. the
    # distributed-hint env vars are exactly what explains a rendezvous hang
    if t.is_alive():
        report["device"] = {"status": "unreachable",
                            "detail": f"no response within {args.timeout}s "
                                      "(tunnel/driver hang)", **probe}
    elif "device_roundtrip_s" not in probe:
        report["device"] = {"status": "error", **probe}
    else:
        report["device"] = {"status": "ok", **probe}

    # -- native decoder
    try:
        from ..data.native import load_native_decoder, native_lib_path

        dec = load_native_decoder(build_if_missing=args.build_native)
        report["native_decoder"] = {
            "status": "ok" if dec is not None else "unavailable",
            "lib": native_lib_path(),
        }
    except Exception as e:  # diagnostic must never crash on a broken leg
        report["native_decoder"] = {"status": "error", "detail": str(e)}

    # -- experiment-specific checks
    if args.experiment:
        exp: dict = {}
        try:
            cfg = _load_cfg(args, overrides)
            exp["config"] = "ok"
            hdf5 = args.hdf5 or _dataset_hdf5_path(cfg)
            exp["hdf5"] = {"path": hdf5, "exists": bool(hdf5) and os.path.exists(hdf5)}
            # THE candidate chain _resolve_params_local uses, without loading
            from ..engine.checkpoint import resolve_checkpoint_path

            mc = cfg.model_config
            ckpt = None
            for cand in _checkpoint_candidates(cfg):
                ckpt = resolve_checkpoint_path(cand)
                if ckpt:
                    break
            exp["checkpoint"] = {"resolved": ckpt,
                                 "load_ckpt": mc.load_ckpt,
                                 "would_fresh_init": not (ckpt and mc.load_ckpt)}
        except Exception as e:
            exp["error"] = f"{type(e).__name__}: {e}"
        report["experiment"] = exp

    ok = report["device"]["status"] == "ok" and \
        report["native_decoder"]["status"] in ("ok", "unavailable") and \
        "error" not in report.get("experiment", {})
    report["status"] = "ok" if ok else "problems"
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


def cmd_configs(args, overrides) -> int:
    from ..config import available_configs

    for name in available_configs():
        print(name)
    return 0


def cmd_bench(args, overrides) -> int:
    import runpy

    # cli/ is a package since round 4: bench.py lives two levels up, at the
    # repo root (clibd_tpu/cli/ops_cmds.py -> clibd_tpu -> repo root)
    path = os.path.join(os.path.dirname(__file__), "..", "..", "bench.py")
    if not os.path.exists(path):
        # pip-installed package: bench.py lives at the repo root, not in the
        # wheel — point the user at the checkout instead of a FileNotFoundError
        raise SystemExit("clibd bench requires a repository checkout "
                         "(bench.py is not shipped in the installed package)")
    runpy.run_path(path, run_name="__main__")
    return 0
