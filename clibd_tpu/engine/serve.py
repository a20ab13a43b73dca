"""Online inference service — resident TPU serving of a trained CLIBD model.

The reference ships the pieces a website backend needs (scripts/save_embedding/
extract_embedding_for_backend.py:1-129 streams per-record embeddings to an
appendable HDF5; extract_embedding_for_single_image.py embeds one record per
process invocation) but no resident server: every request would pay process
start + checkpoint load + XLA compile.  Serving on TPU wants the opposite
shape — ONE resident process holding compiled programs, and concurrent
requests coalesced into a single padded device call: each dispatch pays a
fixed per-call floor (~1.2 ms through this environment's tunnel), so a batch
of 32 costs barely more wall time than a batch of 1.

Design:

- ``InferenceService`` loads params once and jits one forward per
  (modality, bucket-size).  Batches are padded up to the next bucket, so the
  set of compiled shapes is fixed at startup — nothing recompiles at serve
  time, and results are sliced back per request (batch rows are independent
  through ViT/BERT: LayerNorm is per-token, attention per-sample, so padding
  rows cannot perturb real rows).
- Micro-batching: callers enqueue ``(payload, Future)`` from any thread; a
  single batcher thread drains up to ``max_batch`` requests arriving within
  ``window_ms`` of the first, runs ONE device call per modality present, and
  resolves the futures.  Host-side decode (JPEG → tensor) happens on the
  caller's thread, off the batcher's critical path.
- Optional key set: a ``save_embedding_export`` HDF5 (the backend-export
  schema) is preloaded and L2-normalized on device once (``prepare_keys``);
  ``search`` runs exact kNN (ops/knn, the reference's IndexFlatIP semantics)
  and maps indices to the 4-level taxonomy.

The HTTP layer (``make_server``) is stdlib ``ThreadingHTTPServer`` — each
connection gets a thread, which is exactly the concurrency source the
batcher coalesces.
"""

from __future__ import annotations

import base64
import binascii
import json
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

from ..config.schema import LEVELS


def _next_bucket(n: int, buckets) -> int:
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]


@dataclass
class ServeStats:
    """Lock-protected rolling telemetry (exposed at GET /stats)."""

    requests: int = 0
    batches: int = 0
    errors: int = 0
    batch_size_sum: int = 0
    latencies_ms: List[float] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)
    max_latencies: int = 4096

    def record_batch(self, size: int) -> None:
        with self._lock:
            self.batches += 1
            self.batch_size_sum += size

    def record_request(self, latency_ms: float) -> None:
        with self._lock:
            self.requests += 1
            self.latencies_ms.append(latency_ms)
            if len(self.latencies_ms) > self.max_latencies:
                del self.latencies_ms[: len(self.latencies_ms) // 2]

    def record_error(self) -> None:
        with self._lock:
            self.errors += 1

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self.latencies_ms)
            pct = lambda p: (lat[min(len(lat) - 1, int(p * len(lat)))] if lat else None)  # noqa: E731
            return {
                "requests": self.requests,
                "batches": self.batches,
                "errors": self.errors,
                "mean_batch_size": (self.batch_size_sum / self.batches) if self.batches else None,
                "p50_ms": pct(0.50),
                "p95_ms": pct(0.95),
            }


class Overloaded(RuntimeError):
    """Backlog exceeded max_queue — shed with HTTP 503, fail fast."""


def open_gallery_readonly(path: str):
    """Open a gallery HDF5 for reading WITHOUT taking the HDF5 file lock.

    A resident server's read must never hold a lock that blocks the
    gallery WRITER (the reference's backend flow appends continuously; a
    soak test caught a writer failing "unable to truncate a file which is
    already open" mid-reload).  Torn concurrent reads are already handled
    upstream: reload fails -> old gallery serves -> watcher retries after
    write-stability.  Falls back to a locked open ONLY on h5py/libhdf5
    builds without the ``locking`` kwarg (TypeError/ValueError at call
    time) — an OSError (torn/missing file) must propagate to the reload
    retry path, NOT retry locked: a locked retry that lands after the
    writer finishes would hold the flock for the whole gallery load and
    reintroduce the writer-blocking bug this helper removes.
    """
    import h5py

    try:
        return h5py.File(path, "r", locking=False)
    except (TypeError, ValueError):
        return h5py.File(path, "r")


class KeySet:
    """Preloaded retrieval gallery from a save_embedding_export HDF5
    (engine/extract.py backend-export schema): per-modality key matrices
    normalized on device once + the 4-level label table.

    mesh: shard the gallery rows over the mesh 'data' axis — the resident
    layout for galleries exceeding one chip's HBM (5M × 768 fp32 ≈ 15 GB);
    searches use the key-sharded exact top-k (ops/knn, candidates
    all-gathered and re-ranked).

    max_k: every device search runs at this single fixed width and the
    result is sliced to the requested k on the host — the compiled-program
    set stays fixed no matter what k clients send (a per-request k would
    compile a new XLA program per distinct value: at 5M-gallery scale a
    multi-second stall any client could trigger at will)."""

    def __init__(self, path: str, mesh=None, max_k: int = 16,
                 dtype: str = "float32", rerank_oversample: int = 4,
                 selector: str = "auto"):
        from ..ops.knn import prepare_keys

        self.mesh = mesh
        self.dtype = dtype
        # 'auto': TPU-native approx_max_k candidate selection (4.8× at 5M
        # keys, runs at the score-matmul roofline) WHERE the fp32 host
        # re-rank restores an exact final top-k — i.e. int8+rerank
        # galleries; everywhere else stay exact.  'exact'/'approx' force.
        if selector not in ("auto", "exact", "approx"):
            raise ValueError(f"selector must be auto/exact/approx, got {selector!r}")
        # The host re-rank (original fp32 rows, RAM holds what HBM cannot)
        # is active wherever it buys exactness back: always for int8 (scores
        # carry ~1e-3 quantization noise) and, for fp32 galleries, under
        # EXPLICIT approx selection (restores exact ordering over the
        # oversampled candidate set — fp32 big-gallery serving gets the
        # approx_max_k selection speedup without approximate results).
        # fp32 + auto stays exact-on-device with no host copy.  0 disables.
        if dtype == "int8":
            self.rerank_oversample = rerank_oversample
            self.selector = (("approx" if rerank_oversample else "exact")
                             if selector == "auto" else selector)
        else:
            self.selector = "exact" if selector == "auto" else selector
            self.rerank_oversample = (rerank_oversample
                                      if self.selector == "approx" else 0)
        self.features: Dict[str, object] = {}
        self._host_fp32: Dict[str, np.ndarray] = {}
        with open_gallery_readonly(path) as f:
            for t in ("encoded_image_feature", "encoded_dna_feature",
                      "encoded_language_feature"):
                if t in f:
                    # dtype='int8': 4× smaller HBM gallery (ops/knn
                    # QuantizedKeys — approximate scores, recall pinned by
                    # tests); combined with mesh sharding this is the 5M+
                    # single-slice layout
                    rows = f[t][:]
                    self.features[t] = prepare_keys(rows, mesh=mesh,
                                                    dtype=dtype)
                    if self.rerank_oversample:
                        self._host_fp32[t] = np.asarray(rows, np.float32)
            self.labels = {
                level: [x.decode() for x in f[f"{level}_list"][:]] for level in LEVELS
            }
        if not self.features:
            raise ValueError(f"{path} contains no encoded_*_feature datasets")
        self.n = len(self.labels["species"])
        self.max_k = min(max_k, self.n)
        # single fixed device search width (see class docstring); the
        # re-rank path widens it by the oversample factor
        self._device_k = min(self.max_k * max(self.rerank_oversample, 1), self.n)

    def warm(self) -> None:
        """Compile + run the search program once per modality (query batch 1,
        the fixed device k) so no client request pays the compile.  Output
        forced with np.asarray — block_until_ready is a no-op on tunneled
        platforms."""
        for key_type, mat in self.features.items():
            # int8 galleries are QuantizedKeys NamedTuples: dim lives on .q
            dim = mat.q.shape[1] if hasattr(mat, "q") else mat.shape[1]
            self.search(np.zeros((1, dim), np.float32), key_type, k=1)

    def search(self, queries: np.ndarray, key_type: str, k: int):
        from ..ops.knn import knn_search, rerank_candidates

        if key_type not in self.features:
            raise KeyError(
                f"key set has no {key_type} (available: {sorted(self.features)})")
        k = min(max(int(k), 1), self.max_k)
        sims, idx = knn_search(queries, self.features[key_type],
                               k=self._device_k, keys_normalized=True,
                               mesh=self.mesh, shard="keys", n_valid_keys=self.n,
                               selector=self.selector)
        if self.rerank_oversample:
            sims, idx = rerank_candidates(queries, idx,
                                          self._host_fp32[key_type],
                                          k=self.max_k)
        return sims[:, :k], idx[:, :k]


class InferenceService:
    """Resident model + micro-batching executor (see module docstring)."""

    def __init__(
        self,
        params: dict,
        model_cfg,
        keys_path: Optional[str] = None,
        buckets=(1, 2, 4, 8, 16, 32),
        window_ms: float = 4.0,
        max_batch: Optional[int] = None,
        image_size: int = 224,
        resize_to: int = 256,
        keys_mesh=None,
        keys_dtype: str = "float32",
        keys_rerank: int = 4,
        keys_selector: str = "auto",
        language_vocab: Optional[str] = None,
        text_max_len: int = 20,
        max_queue: int = 1024,
    ):
        import jax

        from ..models.clibd import clibd_apply

        self.params = params
        self.mc = model_cfg
        self.image_size = image_size
        self.resize_to = resize_to
        self.window_s = window_ms / 1000.0
        self.max_batch = max_batch or max(buckets)
        # buckets must reach max_batch: _drain can hand _execute up to
        # max_batch rows, and a batch larger than the largest bucket would
        # overflow the padded array
        self.buckets = tuple(sorted({b for b in buckets if b <= self.max_batch}
                                    | {self.max_batch}))
        self.stats = ServeStats()
        self._keys_cfg = {"mesh": keys_mesh, "dtype": keys_dtype,
                          "rerank_oversample": keys_rerank,
                          "selector": keys_selector}
        self.keys_path = keys_path
        self.reloads = 0
        self._reload_lock = threading.Lock()
        self.keys = (KeySet(keys_path, **self._keys_cfg)
                     if keys_path else None)
        self.text_max_len = text_max_len
        self._tok = None
        if language_vocab:
            from ..data.tokenizers import WordPieceTokenizer

            self._tok = WordPieceTokenizer(language_vocab)
        # open_clip-backbone checkpoints tokenize text with CLIP BPE (the
        # same batch-time dispatch as the train/extract pipeline) — picked
        # up from the config's clip.bpe_path, no extra serve flag
        self._clip_tok = None
        if "clip_text" in params:
            from ..data.pipeline import BatchSpec

            self._clip_tok = BatchSpec.maybe_clip_tokenizer(model_cfg)

        mc = model_cfg

        def _embed(modality):
            def fn(p, x):
                kw = {f"{modality}_input": x}
                return clibd_apply(p, mc, **kw)[modality]

            return jax.jit(fn)

        # one jitted program per modality; bucketed shapes warm lazily (the
        # first request at a new bucket pays the compile; pre_warm() moves
        # that to startup)
        self._apply = {"image": _embed("image"), "dna": _embed("dna"),
                       "language": _embed("language")}
        self.max_queue = max_queue
        self._queue: queue.Queue = queue.Queue()
        self._closed = threading.Event()
        self._batcher = threading.Thread(target=self._run_batcher,
                                         name="clibd-serve-batcher", daemon=True)
        self._batcher.start()

    def reload_keys(self, path: Optional[str] = None) -> dict:
        """Hot-swap the retrieval gallery without restarting the server.

        Production galleries GROW (the reference streams new records into
        an appendable backend HDF5, extract_embedding_for_backend.py);
        restarting a resident server to pick them up would pay checkpoint
        load + every bucketed compile again.  The new KeySet is built and
        its search program pre-compiled FULLY before an atomic attribute
        swap (in-flight searches keep the old object; a failed load leaves
        the old gallery serving).  → summary dict for the HTTP response."""
        path = path or self.keys_path
        if path is None:
            raise ValueError("no gallery path: server was started without "
                             "--keys and the reload request named none")
        # serialize concurrent reloads (POST /reload racing the watcher):
        # building two KeySets at once doubles peak memory and interleaves
        # the reloads counter
        with self._reload_lock:
            new_keys = KeySet(path, **self._keys_cfg)
            # pre-compile the search program at the new gallery shape so no
            # client request pays it
            new_keys.warm()
            old_n = self.keys.n if self.keys else 0
            self.keys = new_keys      # atomic swap (GIL attribute store)
            self.keys_path = path
            self.reloads += 1
            return {"keys": new_keys.n, "previous": old_n, "path": path,
                    "modalities": sorted(new_keys.features),
                    "reloads": self.reloads}

    def start_reload_watch(self, interval_s: float) -> None:
        """Auto-reload the gallery when its file changes (`--reload-watch`).

        The reference's production flow APPENDS to the backend HDF5
        (extract_embedding_for_backend.py) while a separate consumer reads
        it; here the consumer is resident, so a poller closes the loop: the
        gallery is reloaded only after its (mtime, size) signature holds
        STABLE for two consecutive polls (a mid-append HDF5 must not be
        loaded torn), and a failed load is retried next tick with the old
        gallery still serving."""
        if self.keys_path is None:
            raise ValueError("reload-watch needs a gallery (--keys)")
        self.stop_reload_watch()  # idempotent: never leak a second watcher
        self._watch_stop = threading.Event()
        # capture the baseline signature HERE, synchronously — a write
        # landing between this call returning and the thread's first poll
        # must still be detected (the thread may not be scheduled for a
        # while on a loaded host)
        baseline = self._gallery_sig()
        self._watcher = threading.Thread(
            target=self._run_watcher, args=(float(interval_s), baseline),
            name="clibd-serve-watcher", daemon=True)
        self._watcher.start()

    def stop_reload_watch(self) -> None:
        if getattr(self, "_watcher", None) is not None:
            self._watch_stop.set()
            self._watcher.join(timeout=10)
            self._watcher = None

    def _gallery_sig(self):
        import os

        try:
            st = os.stat(self.keys_path)
            return (st.st_mtime_ns, st.st_size)
        except OSError:
            return None  # mid-replace/missing: treat as not-yet-stable

    def _run_watcher(self, interval_s: float, loaded) -> None:
        sig = self._gallery_sig
        pending = None
        while not self._watch_stop.wait(interval_s):
            if self._closed.is_set():
                return
            cur = sig()
            if cur is None or cur == loaded:
                pending = None
                continue
            if cur != pending:      # changed again since last poll: still
                pending = cur       # being written — wait for stability
                continue
            try:
                out = self.reload_keys()
                # mark the PRE-load signature as loaded: if the writer
                # appended during the load, the next tick must still see
                # that change and reload again
                loaded, pending = cur, None
                print(f"reload-watch: gallery -> {out['keys']} keys", flush=True)
            except Exception as e:  # noqa: BLE001 — torn read mid-append or
                # transient FS error: the old gallery serves, retry next tick
                print(f"reload-watch: load failed, retrying ({e})", flush=True)

    # -- host-side request preprocessing (caller's thread) ------------------

    def preprocess_image(self, image_bytes: bytes) -> np.ndarray:
        """Checkpoint-faithful eval transform (incl. the long-edge
        `transform_with_resize` variant) — queries must be preprocessed
        exactly like the gallery the keys were extracted with."""
        from ..data.pipeline import preprocess_single_image

        return preprocess_single_image(self.mc, image_bytes,
                                       image_size=self.image_size,
                                       resize_to=self.resize_to)

    def preprocess_dna(self, barcode: str):
        """Tokenize one barcode with the checkpoint's configured tokenizer —
        the SAME dispatch as the training/extract pipeline; an
        overlap-trained checkpoint served with the non-overlap k-mer layout
        would return silently wrong embeddings."""
        from ..data.pipeline import tokenize_single_barcode

        return tokenize_single_barcode(self.mc, barcode)

    def preprocess_text(self, text: str) -> Dict[str, np.ndarray]:
        """Taxonomy-string query → token dict, via the checkpoint's own text
        tokenizer: CLIP BPE for open_clip-backbone checkpoints (the batch
        pipeline's dispatch, pipeline.py BatchSpec), WordPiece otherwise
        (the same layout the HDF5 builders pre-tokenize,
        builders.py language_tokens_*)."""
        if self._clip_tok is not None:
            ids = np.asarray(self._clip_tok([text]), np.int32)[0]
            return {"input_ids": ids}
        toks = self._tok.encode_batch([text], max_length=self.text_max_len)
        return {k: np.asarray(v[0]) for k, v in toks.items()}

    # -- public API ----------------------------------------------------------

    def embed(self, image_bytes: Optional[bytes] = None,
              dna: Optional[str] = None, text: Optional[str] = None,
              timeout: float = 60.0) -> dict:
        """Embed one record (any subset of modalities). Thread-safe; blocks
        until the micro-batch containing this request completes."""
        if image_bytes is None and dna is None and text is None:
            raise ValueError("provide image bytes, a DNA barcode, and/or a "
                             "taxonomy text")
        # validate modality support and decodability HERE, on the caller's
        # thread: a failure inside the batcher would poison every innocent
        # co-batched request with the same exception
        if image_bytes is not None and not (
                "image_encoder" in self.params or "clip_vision" in self.params):
            raise ValueError("this checkpoint has no image encoder")
        if dna is not None and "dna_encoder" not in self.params:
            raise ValueError("this checkpoint has no DNA encoder")
        if text is not None:
            if "clip_text" in self.params:
                if self._clip_tok is None:
                    raise ValueError(
                        "this open_clip text tower needs the CLIP BPE "
                        "tokenizer — set clip.bpe_path in the experiment "
                        "config (as the train/extract pipeline does)")
            elif "language_encoder" in self.params:
                if self._tok is None:
                    raise ValueError("text queries need a WordPiece vocab "
                                     "(serve --language-vocab)")
            else:
                raise ValueError("this checkpoint has no language encoder")
        # load shedding: a bounded backlog keeps tail latency honest — fail
        # fast (HTTP 503 via the RuntimeError mapping) instead of letting
        # queued requests pile past any useful deadline.  qsize() is
        # approximate, which is fine for shedding.
        if self._queue.qsize() >= self.max_queue:
            self.stats.record_error()
            raise Overloaded(
                f"server overloaded ({self.max_queue} requests queued)")
        # a put() after close() drained the queue would leave this caller
        # blocked for its full timeout — shed instead (narrows the race to
        # check-vs-close; close()'s final drain covers most of the rest)
        if self._closed.is_set():
            raise RuntimeError("server shutting down")
        t0 = time.perf_counter()
        item = {"future": Future()}
        if image_bytes is not None:
            try:
                item["image"] = self.preprocess_image(image_bytes)
            except Exception as e:
                raise ValueError(f"undecodable image: {e}") from e
        if dna is not None:
            item["dna"] = self.preprocess_dna(dna)
        if text is not None:
            item["language"] = self.preprocess_text(text)
        self._queue.put(item)
        out = item["future"].result(timeout=timeout)
        self.stats.record_request((time.perf_counter() - t0) * 1e3)
        return out

    def search(self, image_bytes: Optional[bytes] = None,
               dna: Optional[str] = None, text: Optional[str] = None,
               k: int = 5, against: Optional[str] = None,
               timeout: float = 60.0) -> dict:
        """Embed + exact top-k against the preloaded key set.  `against`
        picks the gallery feature ('image'/'dna'/'language'); default is the
        query's own modality (cross-modal search — e.g. an image query
        against DNA keys, the CLIBD headline use — via against='dna')."""
        # snapshot ONCE: a concurrent /reload swaps self.keys atomically, but
        # reading it twice here could pair old-gallery indices with
        # new-gallery labels — silently wrong taxonomy
        keys = self.keys
        if keys is None:
            raise RuntimeError("no key set loaded (start with keys_path=...)")
        emb = self.embed(image_bytes=image_bytes, dna=dna, text=text,
                         timeout=timeout)
        out = {}
        for modality in ("image", "dna", "language"):
            if emb.get(modality) is None:
                continue
            key_type = f"encoded_{against or modality}_feature"
            sims, idx = keys.search(emb[modality][None, :], key_type, k)
            out[modality] = {
                "key_type": key_type,
                "scores": sims[0].tolist(),
                "predictions": [
                    {level: keys.labels[level][j] for level in LEVELS}
                    for j in idx[0].tolist()
                ],
            }
        out["embeddings"] = {m: v.tolist() for m, v in emb.items() if v is not None}
        return out

    def pre_warm(self) -> None:
        """Compile every (modality, bucket) program before accepting traffic.

        Materializes each output with np.asarray, NOT jax.block_until_ready:
        on tunneled platforms block_until_ready can be a no-op, which would
        let pre_warm return while all the compiles are still queued — the
        first real request then absorbs every one of them."""
        for b in self.buckets:
            if "image_encoder" in self.params or "clip_vision" in self.params:
                # eval_transform yields HWC float32 — match it exactly or the
                # first real request would recompile
                s = self.image_size
                x = np.zeros((b, s, s, 3), np.float32)
                np.asarray(self._apply["image"](self.params, x))
            if "dna_encoder" in self.params:
                d0 = self.preprocess_dna("A" * 10)
                if isinstance(d0, dict):  # overlap tokenizer → token dict
                    d = {k: np.zeros((b,) + v.shape, v.dtype)
                         for k, v in d0.items()}
                else:
                    d = np.zeros((b,) + d0.shape, d0.dtype)
                np.asarray(self._apply["dna"](self.params, d))
            if (self._clip_tok is not None
                    or ("language_encoder" in self.params
                        and self._tok is not None)):
                t = self.preprocess_text("warm up")
                np.asarray(self._apply["language"](
                    self.params, {k: np.zeros((b,) + v.shape, v.dtype)
                                  for k, v in t.items()}))
        if self.keys is not None:
            # the search program too (single fixed device k, query batch 1)
            self.keys.warm()

    def close(self) -> None:
        self._closed.set()
        self.stop_reload_watch()
        self._queue.put(None)  # wake the batcher
        self._batcher.join(timeout=10)
        # fail whatever the batcher didn't get to — otherwise those callers
        # block in future.result() until their timeout
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item["future"].done():
                item["future"].set_exception(RuntimeError("server shutting down"))

    # -- batcher -------------------------------------------------------------

    def _drain(self, first) -> list:
        """first request + everything arriving within window_ms, ≤ max_batch."""
        items = [first]
        deadline = time.monotonic() + self.window_s
        while len(items) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _run_batcher(self) -> None:
        while not self._closed.is_set():
            first = self._queue.get()
            if first is None:
                continue
            items = self._drain(first)
            try:
                self._execute(items)
            except Exception as e:  # resolve futures so callers don't hang
                self.stats.record_error()
                for it in items:
                    if not it["future"].done():
                        it["future"].set_exception(e)

    @staticmethod
    def _pad_stack(rows, b):
        """[(i, arr-or-dict)] → padded batch of bucket size b (dicts are
        padded per field — the language tokenizer emits a token dict)."""
        first = rows[0][1]
        if isinstance(first, dict):
            return {k: InferenceService._pad_stack(
                [(i, d[k]) for i, d in rows], b) for k in first}
        x = np.zeros((b,) + first.shape, first.dtype)
        for j, (_, arr) in enumerate(rows):
            x[j] = arr
        return x

    def _execute(self, items: list) -> None:
        self.stats.record_batch(len(items))
        results = [dict() for _ in items]
        for modality in ("image", "dna", "language"):
            rows = [(i, it[modality]) for i, it in enumerate(items) if modality in it]
            if not rows:
                continue
            b = _next_bucket(len(rows), self.buckets)
            x = self._pad_stack(rows, b)
            out = np.asarray(self._apply[modality](self.params, x))
            for j, (i, _) in enumerate(rows):
                results[i][modality] = out[j]
        for it, res in zip(items, results):
            for modality in ("image", "dna", "language"):
                res.setdefault(modality, None)
            it["future"].set_result(res)


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------


def make_server(service: InferenceService, host: str = "127.0.0.1",
                port: int = 8000) -> ThreadingHTTPServer:
    """HTTP front end:

    - GET  /healthz               → {"status": "ok", "keys": N|null}
    - GET  /stats                 → ServeStats snapshot
    - POST /embed  {"image_b64"?, "dna"?, "text"?}   → embeddings
    - POST /search {"image_b64"?, "dna"?, "text"?, "k"?, "against"?}
                                  → top-k taxonomy per query modality
    """

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                batcher_up = service._batcher.is_alive()
                self._send(200 if batcher_up else 503,
                           {"status": "ok" if batcher_up else "batcher dead",
                            "keys": service.keys.n if service.keys else None,
                            "buckets": list(service.buckets),
                            "reloads": service.reloads})
            elif self.path == "/stats":
                self._send(200, service.stats.snapshot())
            elif self.path == "/metrics":
                # Prometheus text exposition (/stats is the JSON twin) —
                # what a scraper actually ingests; counters are cumulative
                # since process start, as Prometheus expects
                s = service.stats.snapshot()
                lines = [
                    "# TYPE clibd_requests_total counter",
                    f"clibd_requests_total {s['requests']}",
                    "# TYPE clibd_request_errors_total counter",
                    f"clibd_request_errors_total {s['errors']}",
                    "# TYPE clibd_device_batches_total counter",
                    f"clibd_device_batches_total {s['batches']}",
                    "# TYPE clibd_gallery_reloads_total counter",
                    f"clibd_gallery_reloads_total {service.reloads}",
                    "# TYPE clibd_gallery_keys gauge",
                    f"clibd_gallery_keys {service.keys.n if service.keys else 0}",
                    "# TYPE clibd_batcher_up gauge",
                    f"clibd_batcher_up {int(service._batcher.is_alive())}",
                ]
                for name, v in (("clibd_mean_batch_size", s["mean_batch_size"]),
                                ("clibd_latency_p50_ms", s["p50_ms"]),
                                ("clibd_latency_p95_ms", s["p95_ms"])):
                    if v is not None:
                        lines += [f"# TYPE {name} gauge", f"{name} {v}"]
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path not in ("/embed", "/search", "/reload"):
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(req, dict):
                    self._send(400, {"error": "body must be a JSON object"})
                    return
                if self.path == "/reload":
                    # admin surface: hot-swap the gallery (bind-address is
                    # the access control — the server defaults to loopback;
                    # front it with a proxy before exposing it)
                    keys_arg = req.get("keys")
                    if keys_arg is not None and not isinstance(keys_arg, str):
                        self._send(400, {"error": "keys must be a string path"})
                        return
                    try:
                        out = service.reload_keys(keys_arg)
                    except OSError as e:
                        # missing/unreadable gallery path is a client error —
                        # and the old gallery keeps serving.  Scoped here (not
                        # in the broad tuple below) so a client disconnect
                        # mid-response (BrokenPipeError) isn't miscounted as a
                        # request error.
                        service.stats.record_error()
                        self._send(400, {"error": str(e)})
                        return
                    self._send(200, out)
                    return
                for field in ("image_b64", "dna", "text"):
                    if req.get(field) is not None and not isinstance(req[field], str):
                        self._send(400, {"error": f"{field} must be a string"})
                        return
                image_bytes = None
                if req.get("image_b64"):
                    image_bytes = base64.b64decode(req["image_b64"], validate=True)
                dna = req.get("dna")
                text = req.get("text")
                if image_bytes is None and dna is None and text is None:
                    self._send(400, {"error": "provide image_b64, dna, "
                                              "and/or text"})
                    return
                if self.path == "/embed":
                    out = service.embed(image_bytes=image_bytes, dna=dna,
                                        text=text)
                    self._send(200, {
                        m: (v.tolist() if v is not None else None)
                        for m, v in out.items()})
                else:
                    out = service.search(image_bytes=image_bytes, dna=dna,
                                         text=text, k=int(req.get("k", 5)),
                                         against=req.get("against"))
                    self._send(200, out)
            except Overloaded as e:
                # embed() already counted the shed in stats — don't double
                self._send(503, {"error": str(e)})
            except (ValueError, KeyError, binascii.Error, json.JSONDecodeError) as e:
                service.stats.record_error()
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — a failed request must
                # never kill the connection without a response (and the
                # stack belongs in the server log, not just the socket)
                import traceback

                traceback.print_exc()
                service.stats.record_error()
                code = 503 if isinstance(e, RuntimeError) else 500
                self._send(code, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)
