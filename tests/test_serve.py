"""Resident inference server (engine/serve.py + `cli serve`): padded
micro-batching must be bit-equivalent to direct clibd_apply, concurrent
requests must coalesce into fewer device calls, and the HTTP layer must
round-trip embed/search/stats and reject malformed input."""

import base64
import json
import threading
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from tests.fixtures import random_jpeg_bytes


def _tiny_cfg():
    from clibd_tpu.config.schema import BertConfig, GlobalConfig, ViTConfig

    cfg = GlobalConfig()
    mc = cfg.model_config
    mc.output_dim = 16
    mc.image.vit = ViTConfig(image_size=64, patch_size=16, hidden_size=32,
                             num_layers=1, num_heads=4, mlp_dim=64)
    mc.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=1,
                             num_heads=4, intermediate_size=64,
                             max_position_embeddings=140, with_mlm_head=True)
    return cfg


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    import jax

    from clibd_tpu.engine.extract import save_embedding_export
    from clibd_tpu.engine.serve import InferenceService
    from clibd_tpu.models import init_clibd_params

    cfg = _tiny_cfg()
    mc = cfg.model_config
    params = init_clibd_params(jax.random.PRNGKey(0), mc)

    # gallery: 6 records whose image/DNA features are random unit vectors,
    # except row 0, which we will overwrite with a real query embedding so
    # top-1 is known
    rng = np.random.default_rng(1)
    n, d = 6, mc.output_dim
    feats = rng.normal(size=(n, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)

    jpeg = random_jpeg_bytes(rng, h=64, w=80)
    svc = InferenceService(params, mc, window_ms=200.0, max_batch=4,
                           buckets=(1, 2, 4), image_size=64, resize_to=72)
    emb0 = svc.embed(image_bytes=jpeg)
    feats[0] = emb0["image"]

    keys_path = tmp_path_factory.mktemp("serve") / "keys.hdf5"
    save_embedding_export(str(keys_path), {
        "encoded_image_feature": feats,
        "encoded_dna_feature": feats[::-1].copy(),
        "encoded_language_feature": None,
        "label_list": [{lv: f"{lv}{i}" for lv in
                        ("order", "family", "genus", "species")}
                       for i in range(n)],
        "file_name_list": [f"f{i}.jpg" for i in range(n)],
    })
    svc.close()

    service = InferenceService(params, mc, keys_path=str(keys_path),
                               window_ms=200.0, max_batch=4, buckets=(1, 2, 4),
                               image_size=64, resize_to=72)
    yield {"service": service, "params": params, "mc": mc, "jpeg": jpeg,
           "rng": rng}
    service.close()


def test_embed_matches_direct_apply(served):
    """Bucket padding must not perturb real rows (LN is per-token, attention
    per-sample): service output == unbatched clibd_apply."""
    from clibd_tpu.data.tokenizers import tokenize_dna_batch
    from clibd_tpu.models.clibd import clibd_apply

    svc, params, mc = served["service"], served["params"], served["mc"]
    jpeg = served["jpeg"]
    barcode = "ACGTACGTAAACCCGGGTTTACGT"

    out = svc.embed(image_bytes=jpeg, dna=barcode)
    # jit-vs-eager bf16 fusion differences are ~1e-3; the loose check pins
    # semantics, the exact row-isolation check below pins padding
    img_direct = clibd_apply(
        params, mc, image_input=svc.preprocess_image(jpeg)[None])["image"][0]
    dna_direct = clibd_apply(
        params, mc,
        dna_input=tokenize_dna_batch([barcode], k=mc.dna.kmer,
                                     max_bp=mc.dna.max_bp))["dna"][0]
    np.testing.assert_allclose(out["image"], np.asarray(img_direct), atol=5e-3)
    np.testing.assert_allclose(out["dna"], np.asarray(dna_direct), atol=5e-3)
    assert abs(float(np.linalg.norm(out["image"])) - 1.0) < 1e-5

    # row isolation inside ONE compiled program: the same query row must be
    # bit-identical whether its padding neighbors are zeros or other images
    x0 = svc.preprocess_image(jpeg)
    x_other = svc.preprocess_image(random_jpeg_bytes(
        np.random.default_rng(7), h=64, w=80))
    batch_zeros = np.stack([x0, np.zeros_like(x0), np.zeros_like(x0),
                            np.zeros_like(x0)])
    batch_mixed = np.stack([x0, x_other, x_other, x_other])
    out_zeros = np.asarray(svc._apply["image"](params, batch_zeros))
    out_mixed = np.asarray(svc._apply["image"](params, batch_mixed))
    np.testing.assert_array_equal(out_zeros[0], out_mixed[0])


def test_concurrent_requests_coalesce(served):
    """4 concurrent embeds inside one 200 ms window → fewer device batches
    than requests (the micro-batching reason-to-exist)."""
    svc, rng = served["service"], served["rng"]
    jpegs = [random_jpeg_bytes(rng, h=64, w=80) for _ in range(4)]
    b0 = svc.stats.batches
    with ThreadPoolExecutor(max_workers=4) as pool:
        outs = list(pool.map(lambda j: svc.embed(image_bytes=j), jpegs))
    assert all(o["image"] is not None for o in outs)
    batches = svc.stats.batches - b0
    assert 1 <= batches < 4, f"no coalescing happened ({batches} batches)"
    # distinct inputs must keep distinct outputs (no slicing mixup)
    assert not np.allclose(outs[0]["image"], outs[1]["image"])


def test_search_finds_planted_key(served):
    svc, jpeg = served["service"], served["jpeg"]
    out = svc.search(image_bytes=jpeg, k=3)
    top = out["image"]["predictions"][0]
    assert top["species"] == "species0"
    assert out["image"]["scores"][0] == pytest.approx(1.0, abs=1e-4)
    assert out["image"]["key_type"] == "encoded_image_feature"
    # cross-modal: image query against the DNA gallery (feats reversed, so
    # the planted row lands at the end)
    out2 = svc.search(image_bytes=jpeg, k=1, against="dna")
    assert out2["image"]["key_type"] == "encoded_dna_feature"
    assert out2["image"]["predictions"][0]["species"] == "species5"


def test_bucket_list_always_reaches_max_batch(served):
    """max_batch beyond the largest bucket must not overflow the padded
    array: buckets are extended to include max_batch."""
    import jax

    from clibd_tpu.engine.serve import InferenceService
    from clibd_tpu.models import init_clibd_params

    cfg = _tiny_cfg()
    svc = InferenceService(init_clibd_params(jax.random.PRNGKey(0), cfg.model_config),
                           cfg.model_config, window_ms=300.0,
                           buckets=(1, 2), max_batch=3,
                           image_size=64, resize_to=72)
    try:
        assert svc.buckets == (1, 2, 3)
        rng = np.random.default_rng(3)
        jpegs = [random_jpeg_bytes(rng, h=64, w=80) for _ in range(3)]
        with ThreadPoolExecutor(max_workers=3) as pool:
            outs = list(pool.map(lambda j: svc.embed(image_bytes=j), jpegs))
        assert all(o["image"] is not None for o in outs)
    finally:
        svc.close()


def test_unsupported_modality_and_bad_image_rejected_upfront(served):
    """Modality/decodability failures must raise on the caller's thread
    (ValueError → HTTP 400), never poison a co-batched device call."""
    import jax

    from clibd_tpu.engine.serve import InferenceService
    from clibd_tpu.models import init_clibd_params

    cfg = _tiny_cfg()
    cfg.model_config.dna.enable = False
    params = init_clibd_params(jax.random.PRNGKey(0), cfg.model_config)
    params.pop("dna_encoder", None)
    svc = InferenceService(params, cfg.model_config, window_ms=1.0,
                           buckets=(1,), image_size=64, resize_to=72)
    try:
        with pytest.raises(ValueError, match="no DNA encoder"):
            svc.embed(dna="ACGT")
        with pytest.raises(ValueError, match="undecodable image"):
            svc.embed(image_bytes=b"definitely not a jpeg")
    finally:
        svc.close()


def test_load_shedding(tmp_path):
    """Beyond max_queue queued requests, embed() fails fast with the
    overloaded RuntimeError (HTTP 503) instead of growing the backlog."""
    import jax

    from clibd_tpu.engine.serve import InferenceService
    from clibd_tpu.models import init_clibd_params

    cfg = _tiny_cfg()
    svc = InferenceService(init_clibd_params(jax.random.PRNGKey(0), cfg.model_config),
                           cfg.model_config, window_ms=1.0, buckets=(1,),
                           image_size=64, resize_to=72, max_queue=2)
    # park the batcher so the queue actually fills
    svc._closed.set()
    svc._queue.put(None)
    svc._batcher.join(timeout=10)
    try:
        svc._queue.put({"future": None})
        svc._queue.put({"future": None})
        with pytest.raises(RuntimeError, match="overloaded"):
            svc.embed(dna="ACGT")
        assert svc.stats.snapshot()["errors"] == 1
    finally:
        # drain the planted junk so close() doesn't trip on future=None
        while not svc._queue.empty():
            svc._queue.get_nowait()
        svc.close()


def test_close_fails_queued_requests():
    """Requests still queued at close() get an immediate RuntimeError, not a
    60 s future timeout."""
    from concurrent.futures import Future

    import jax

    from clibd_tpu.engine.serve import InferenceService
    from clibd_tpu.models import init_clibd_params

    cfg = _tiny_cfg()
    svc = InferenceService(init_clibd_params(jax.random.PRNGKey(0), cfg.model_config),
                           cfg.model_config, window_ms=1.0, buckets=(1,),
                           image_size=64, resize_to=72)
    # stop the batcher first so the planted item stays queued
    svc._closed.set()
    svc._queue.put(None)
    svc._batcher.join(timeout=10)
    orphan = {"future": Future(), "dna": svc.preprocess_dna("ACGT")}
    svc._queue.put(orphan)
    svc.close()
    with pytest.raises(RuntimeError, match="shutting down"):
        orphan["future"].result(timeout=1)


def test_text_queries(tmp_path):
    """Taxonomy-text serving: WordPiece-tokenized text → language embedding,
    text search against the language gallery; clean 400-style errors when
    the vocab or the encoder is absent."""
    import jax

    from clibd_tpu.data.tokenizers import WordPieceTokenizer
    from clibd_tpu.engine.extract import save_embedding_export
    from clibd_tpu.engine.serve import InferenceService
    from clibd_tpu.models import init_clibd_params
    from clibd_tpu.models.clibd import clibd_apply
    from tests.fixtures import TINY_VOCAB, write_tiny_vocab

    vocab_path = write_tiny_vocab(str(tmp_path / "vocab.txt"))
    cfg = _tiny_cfg()
    cfg.model_config.language.bert.vocab_size = len(TINY_VOCAB)
    mc = cfg.model_config
    params = init_clibd_params(jax.random.PRNGKey(0), mc)

    svc = InferenceService(params, mc, window_ms=1.0, buckets=(1, 2),
                           image_size=64, resize_to=72,
                           language_vocab=vocab_path)
    try:
        text = "diptera cecidomyiidae"
        out = svc.embed(text=text)
        assert out["language"] is not None and out["image"] is None
        toks = WordPieceTokenizer(vocab_path).encode_batch([text], max_length=20)
        direct = clibd_apply(params, mc, language_input={
            k: np.asarray(v) for k, v in toks.items()})["language"][0]
        np.testing.assert_allclose(out["language"], np.asarray(direct), atol=5e-3)

        # plant the text embedding in a language gallery → top-1 hit
        rng = np.random.default_rng(2)
        feats = rng.normal(size=(4, mc.output_dim)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        feats[2] = out["language"]
        keys_path = tmp_path / "lang_keys.hdf5"
        save_embedding_export(str(keys_path), {
            "encoded_image_feature": None, "encoded_dna_feature": None,
            "encoded_language_feature": feats,
            "label_list": [{lv: f"{lv}{i}" for lv in
                            ("order", "family", "genus", "species")}
                           for i in range(4)],
            "file_name_list": [f"f{i}.jpg" for i in range(4)],
        })
        svc2 = InferenceService(params, mc, keys_path=str(keys_path),
                                window_ms=1.0, buckets=(1,),
                                image_size=64, resize_to=72,
                                language_vocab=vocab_path)
        try:
            res = svc2.search(text=text, k=2)
            assert res["language"]["key_type"] == "encoded_language_feature"
            assert res["language"]["predictions"][0]["species"] == "species2"
        finally:
            svc2.close()

        # no vocab configured → upfront ValueError
        svc3 = InferenceService(params, mc, window_ms=1.0, buckets=(1,),
                                image_size=64, resize_to=72)
        try:
            with pytest.raises(ValueError, match="language-vocab"):
                svc3.embed(text=text)
        finally:
            svc3.close()
    finally:
        svc.close()


def test_clip_text_queries(tmp_path):
    """open_clip-backbone checkpoints serve text through the CLIP BPE
    tokenizer (the batch pipeline's own dispatch, pipeline.py
    BatchSpec.maybe_clip_tokenizer) — embedding parity vs direct
    clibd_apply, and a clean upfront error naming clip.bpe_path when the
    merges file is not configured."""
    import gzip

    import jax

    from clibd_tpu.config.schema import GlobalConfig
    from clibd_tpu.data.clip_tokenizer import CLIPTokenizer
    from clibd_tpu.engine.serve import InferenceService
    from clibd_tpu.models import init_clibd_params
    from clibd_tpu.models.clibd import clibd_apply

    bpe = tmp_path / "bpe.txt.gz"
    with gzip.open(bpe, "wt", encoding="utf-8") as f:
        f.write("\n".join(["#version: 0.2", "d i", "di p", "dip t"]))

    cfg = GlobalConfig()
    mc = cfg.model_config
    mc.backbone = "open_clip"
    mc.output_dim = 16
    mc.image.enable = False  # text-only keeps the test fast
    mc.dna.enable = False
    c = mc.clip
    c.context_length, c.text_hidden, c.text_layers = 16, 16, 1
    c.text_heads, c.text_mlp, c.embed_dim = 2, 32, 16
    c.bpe_path = str(bpe)

    params = init_clibd_params(jax.random.PRNGKey(0), mc)
    svc = InferenceService(params, mc, window_ms=1.0, buckets=(1, 2),
                           image_size=64)
    try:
        text = "diptera cecidomyiidae"
        out = svc.embed(text=text)
        assert out["language"] is not None
        ids = np.asarray(CLIPTokenizer(str(bpe), context_length=16)([text]),
                         np.int32)
        direct = clibd_apply(params, mc,
                             language_input={"input_ids": ids})["language"][0]
        np.testing.assert_allclose(out["language"], np.asarray(direct),
                                   atol=5e-3)
        svc.pre_warm()  # covers the clip-text warm branch
    finally:
        svc.close()

    # merges file not configured → upfront ValueError naming the knob
    mc.clip.bpe_path = ""
    svc2 = InferenceService(params, mc, window_ms=1.0, buckets=(1,),
                            image_size=64)
    try:
        with pytest.raises(ValueError, match="bpe_path"):
            svc2.embed(text=text)
    finally:
        svc2.close()


def test_sharded_gallery_search_matches_replicated(served, tmp_path):
    """KeySet(mesh=...) — gallery rows sharded over the 8-device CPU mesh —
    returns the same top-k as the replicated gallery (the layout for
    galleries larger than one chip's HBM)."""
    import jax

    from clibd_tpu.engine.extract import save_embedding_export
    from clibd_tpu.engine.serve import KeySet
    from clibd_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(5)
    n, d = 21, 16  # 21 % 8 != 0 → exercises pad-row masking
    feats = rng.normal(size=(n, d)).astype(np.float32)
    path = tmp_path / "big_keys.hdf5"
    save_embedding_export(str(path), {
        "encoded_image_feature": feats,
        "encoded_dna_feature": None, "encoded_language_feature": None,
        "label_list": [{lv: f"{lv}{i}" for lv in
                        ("order", "family", "genus", "species")}
                       for i in range(n)],
        "file_name_list": [f"f{i}.jpg" for i in range(n)],
    })
    mesh = create_mesh(jax.devices()[:8])
    flat = KeySet(str(path))
    sharded = KeySet(str(path), mesh=mesh)
    q = rng.normal(size=(3, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s1, i1 = flat.search(q, "encoded_image_feature", k=4)
    s2, i2 = sharded.search(q, "encoded_image_feature", k=4)
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    np.testing.assert_array_equal(i1, i2)
    assert int(i2.max()) < n


def test_search_without_keys_raises():
    import jax

    from clibd_tpu.engine.serve import InferenceService
    from clibd_tpu.models import init_clibd_params

    cfg = _tiny_cfg()
    svc = InferenceService(init_clibd_params(jax.random.PRNGKey(0), cfg.model_config),
                           cfg.model_config, window_ms=1.0, buckets=(1,),
                           image_size=64, resize_to=72)
    try:
        with pytest.raises(RuntimeError, match="no key set"):
            svc.search(dna="ACGT")
        with pytest.raises(ValueError, match="provide image bytes"):
            svc.embed()
    finally:
        svc.close()


def test_http_roundtrip(served):
    from clibd_tpu.engine.serve import make_server

    svc, jpeg = served["service"], served["jpeg"]
    server = make_server(svc, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    def call(path, payload=None, method=None):
        url = f"http://127.0.0.1:{port}{path}"
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())

    try:
        status, health = call("/healthz")
        assert status == 200 and health["status"] == "ok" and health["keys"] == 6

        b64 = base64.b64encode(jpeg).decode()
        status, emb = call("/embed", {"image_b64": b64, "dna": "ACGTACGT"})
        assert status == 200
        assert len(emb["image"]) == served["mc"].output_dim
        assert len(emb["dna"]) == served["mc"].output_dim

        status, res = call("/search", {"image_b64": b64, "k": 2})
        assert status == 200
        assert res["image"]["predictions"][0]["species"] == "species0"

        status, stats = call("/stats")
        assert status == 200 and stats["requests"] >= 2

        # Prometheus text exposition twin of /stats
        req = urllib.request.Request(f"http://127.0.0.1:{port}/metrics")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain")
            metrics = {}
            for line in r.read().decode().splitlines():
                if line and not line.startswith("#"):
                    name, val = line.split()
                    metrics[name] = float(val)
        assert metrics["clibd_requests_total"] >= 2
        assert metrics["clibd_gallery_keys"] == 6
        assert metrics["clibd_batcher_up"] == 1
        assert "clibd_latency_p50_ms" in metrics

        # malformed: no modality → 400; invalid b64 → 400; valid b64 of
        # non-image bytes → 400; non-object JSON body → 400; unknown → 404
        bad_img = base64.b64encode(b"not an image").decode()
        for path, payload, want in (("/embed", {}, 400),
                                    ("/embed", {"image_b64": "!!!"}, 400),
                                    ("/embed", {"image_b64": bad_img}, 400),
                                    ("/embed", [1, 2], 400),
                                    ("/nope", {"dna": "A"}, 404)):
            try:
                call(path, payload)
                assert False, f"expected HTTPError for {path}"
            except urllib.error.HTTPError as e:
                assert e.code == want
    finally:
        server.shutdown()
        server.server_close()


def test_cmd_serve_builds_service_and_shuts_down(tmp_path, monkeypatch):
    """cmd_serve end-to-end minus serve_forever: builds the service from the
    experiment config (image geometry derived from the ViT config), starts
    the real HTTP server, and tears both down cleanly."""
    import clibd_tpu.cli as cli
    from clibd_tpu.engine import serve as serve_mod

    exp = tmp_path / "tiny.yaml"
    exp.write_text(
        "model_output_name: serve_test\n"
        "dataset: bioscan_1m\n"
        "batch_size: 4\n"
        "output_dim: 16\n"
        "load_ckpt: false\n"
        "image:\n  vit:\n    image_size: 64\n    patch_size: 16\n"
        "    hidden_size: 32\n    num_layers: 1\n    num_heads: 4\n"
        "    mlp_dim: 64\n"
        "dna:\n  bert:\n    vocab_size: 1027\n    hidden_size: 32\n"
        "    num_layers: 1\n    num_heads: 4\n    intermediate_size: 64\n"
        "    max_position_embeddings: 140\n    with_mlm_head: true\n")

    built = {}
    orig_make_server = serve_mod.make_server

    def spy_make_server(service, host="127.0.0.1", port=8000):
        built["service"] = service
        server = orig_make_server(service, host=host, port=port)

        class Wrap:
            server_address = server.server_address

            def serve_forever(self):
                raise KeyboardInterrupt  # immediate clean exit

            def shutdown(self):
                # the real serve_forever never ran, so real shutdown()
                # would block forever on its is-shut-down event
                pass

            def server_close(self):
                server.server_close()

        return Wrap()

    # cmd_serve does `from .engine.serve import make_server` at call time,
    # so patching the serve module is enough
    monkeypatch.setattr(serve_mod, "make_server", spy_make_server)
    rc = cli.main(["serve", "-e", str(exp), "--port", "0", "--no-warm",
                   "--max-batch", "3",
                   f"model_output_dir={tmp_path}/out",
                   f"project_root_path={tmp_path}"])
    assert rc == 0
    svc = built["service"]
    assert svc.image_size == 64 and svc.resize_to == round(64 * 256 / 224)
    assert svc.buckets == (1, 2, 3) and svc.keys is None
    assert svc._closed.is_set()  # cmd_serve's finally closed the service


def test_cli_serve_parser_wiring(monkeypatch):
    """`serve` subcommand parses and dispatches (no server started)."""
    import clibd_tpu.cli as cli

    seen = {}

    def fake_serve(args, overrides):
        seen.update(vars(args))
        seen["overrides"] = overrides
        return 0

    monkeypatch.setattr(cli, "cmd_serve", fake_serve)
    rc = cli.main(["serve", "-e", "x.yaml", "--port", "0",
                   "--keys", "k.hdf5", "--window-ms", "2",
                   "--max-batch", "8", "pipeline.num_workers=0"])
    assert rc == 0
    assert seen["command"] == "serve" and seen["max_batch"] == 8
    assert seen["window_ms"] == 2.0 and seen["keys"] == "k.hdf5"
    assert seen["overrides"] == ["pipeline.num_workers=0"]


def test_preprocess_honors_checkpoint_tokenizer_and_transform(tmp_path):
    """Serve-time preprocessing must match the pipeline the gallery was
    extracted with (code-review findings): an overlap-tokenizer checkpoint
    gets overlap token dicts (not the non-overlap k-mer layout), and a
    `transform_with_resize` checkpoint gets the long-edge eval transform."""
    import jax

    from clibd_tpu.data.tokenizers import tokenize_dna_batch_overlapping
    from clibd_tpu.data.transforms import eval_transform
    from clibd_tpu.engine.serve import InferenceService
    from clibd_tpu.models import init_clibd_params

    cfg = _tiny_cfg()
    mc = cfg.model_config
    mc.dna.tokenizer = "overlap"
    mc.dna.kmer = 4
    mc.dna.max_bp = 120
    mc.dna.bert.vocab_size = 259  # 4^4 + 3 specials (overlap vocab)
    mc.dna.bert.max_position_embeddings = 130
    mc.transform_with_resize = True
    params = init_clibd_params(jax.random.PRNGKey(0), mc)
    svc = InferenceService(params, mc, window_ms=1.0, buckets=(1, 2),
                           max_batch=2, image_size=64, resize_to=72)
    try:
        barcode = "ACGTACGTACGTACGTACGT"
        tok = svc.preprocess_dna(barcode)
        assert isinstance(tok, dict) and set(tok) == {"input_ids", "attention_mask"}
        ids, att = tokenize_dna_batch_overlapping(
            [barcode], k=4, stride=1, max_bp=120)
        np.testing.assert_array_equal(tok["input_ids"], ids[0])
        np.testing.assert_array_equal(tok["attention_mask"], att[0, : ids.shape[1]])

        rng = np.random.default_rng(3)
        jpeg = random_jpeg_bytes(rng, h=64, w=96)
        img = svc.preprocess_image(jpeg)
        np.testing.assert_array_equal(
            img, np.asarray(eval_transform(jpeg, size=64, resize_to=72,
                                           long_edge=True)))
        assert not np.array_equal(
            img, np.asarray(eval_transform(jpeg, size=64, resize_to=72)))

        # the token dict flows through the micro-batcher and matches a
        # direct apply (pre_warm covers the dict-shaped warm batch too)
        svc.pre_warm()
        out = svc.embed(dna=barcode)
        from clibd_tpu.models.clibd import clibd_apply

        direct = clibd_apply(params, mc, dna_input={
            "input_ids": ids, "attention_mask": att[:, : ids.shape[1]]})["dna"]
        # jit-vs-eager bf16 fusion differences are ~1e-3 (same bound as
        # test_embed_matches_direct_apply)
        np.testing.assert_allclose(out["dna"], np.asarray(direct)[0], atol=5e-3)
    finally:
        svc.close()


def test_keyset_int8_gallery(tmp_path):
    """--keys-dtype int8: the compressed gallery loads, stores int8 rows
    (4× smaller), and search returns the planted neighbor."""
    from clibd_tpu.engine.extract import save_embedding_export
    from clibd_tpu.engine.serve import KeySet
    from clibd_tpu.ops.knn import QuantizedKeys

    rng = np.random.default_rng(5)
    n, d = 64, 16
    feats = rng.normal(size=(n, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = [{"order": "o", "family": "f", "genus": "g",
               "species": f"s{i}"} for i in range(n)]
    path = tmp_path / "keys.hdf5"
    save_embedding_export(str(path), {
        "encoded_image_feature": feats, "label_list": labels,
        "file_name_list": [f"{i}.jpg" for i in range(n)]})

    ks = KeySet(str(path), dtype="int8")
    qk = ks.features["encoded_image_feature"]
    assert isinstance(qk, QuantizedKeys) and qk.q.dtype == np.int8
    # warm() must handle QuantizedKeys galleries (pre_warm / reload path —
    # QuantizedKeys has no .shape; regression for an int8 startup crash)
    ks.warm()
    sims, idx = ks.search(feats[7][None] + 0.001, "encoded_image_feature", k=3)
    assert idx[0, 0] == 7 and sims[0, 0] > 0.99


def test_gallery_read_never_blocks_writer(tmp_path):
    """open_gallery_readonly must not take the HDF5 file lock: a gallery
    WRITER process truncating the live path while the server's read handle
    is open must succeed (soak-test regression: writer failed "unable to
    truncate a file which is already open" mid-reload).  The writer runs in
    a SUBPROCESS — the flock only bites cross-process; in-process libhdf5
    refuses the truncate regardless via its open-file table."""
    import subprocess
    import sys

    import h5py

    from clibd_tpu.engine.extract import save_embedding_export
    from clibd_tpu.engine.serve import open_gallery_readonly

    rng = np.random.default_rng(5)
    feats = rng.normal(size=(4, 8)).astype(np.float32)
    path = tmp_path / "live.hdf5"
    save_embedding_export(str(path), {
        "encoded_image_feature": feats,
        "label_list": [{lv: f"{lv}{i}" for lv in
                        ("order", "family", "genus", "species")}
                       for i in range(4)],
        "file_name_list": [f"{i}.jpg" for i in range(4)]})

    writer_code = (
        "import h5py, numpy as np\n"
        f"with h5py.File({str(path)!r}, 'w') as w:\n"
        "    w.create_dataset('encoded_image_feature',"
        " data=np.zeros((2, 8), np.float32))\n"
    )
    reader = open_gallery_readonly(str(path))
    try:
        assert reader["encoded_image_feature"].shape == (4, 8)
        res = subprocess.run([sys.executable, "-c", writer_code],
                             capture_output=True, text=True, timeout=120)
        assert res.returncode == 0, res.stderr
    finally:
        reader.close()
    with h5py.File(str(path), "r") as f:
        assert f["encoded_image_feature"].shape == (2, 8)


def test_gallery_hot_reload(served, tmp_path):
    """POST /reload hot-swaps the gallery: a grown gallery (new planted row)
    serves immediately, a bad path returns 400 and leaves the old gallery
    untouched, and /healthz counts reloads."""
    from clibd_tpu.engine.extract import save_embedding_export
    from clibd_tpu.engine.serve import make_server

    svc, jpeg = served["service"], served["jpeg"]
    emb = svc.embed(image_bytes=jpeg)["image"]

    # grown gallery: 10 rows, the query embedding planted at row 9 with a
    # species name only the NEW gallery has
    rng = np.random.default_rng(11)
    feats = rng.normal(size=(10, emb.shape[0])).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    feats[9] = emb
    new_path = tmp_path / "grown.hdf5"
    save_embedding_export(str(new_path), {
        "encoded_image_feature": feats,
        "label_list": [{lv: f"new_{lv}{i}" for lv in
                        ("order", "family", "genus", "species")}
                       for i in range(10)],
        "file_name_list": [f"n{i}.jpg" for i in range(10)]})

    server = make_server(svc, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def call(path, payload=None):
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data)
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())

    old_path = svc.keys_path
    try:
        status, out = call("/reload", {"keys": str(new_path)})
        assert status == 200 and out["keys"] == 10 and out["previous"] == 6
        status, res = call("/search", {
            "image_b64": base64.b64encode(jpeg).decode(), "k": 1})
        assert res["image"]["predictions"][0]["species"] == "new_species9"
        status, health = call("/healthz")
        assert health["keys"] == 10 and health["reloads"] == 1

        # failed reload: 400, old gallery still serving
        try:
            call("/reload", {"keys": str(tmp_path / "missing.hdf5")})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        status, health = call("/healthz")
        assert health["keys"] == 10 and health["reloads"] == 1
    finally:
        # restore the module-scoped fixture's gallery for later tests
        svc.reload_keys(old_path)
        server.shutdown()
        server.server_close()


def test_reload_watch_auto_swaps(served, tmp_path):
    """start_reload_watch: an on-disk gallery change (stable across two
    polls) auto-reloads without any HTTP call; a torn/garbage write is
    retried with the old gallery still serving until a valid file lands."""
    import shutil
    import time

    from clibd_tpu.engine.extract import save_embedding_export

    svc, jpeg = served["service"], served["jpeg"]
    emb = svc.embed(image_bytes=jpeg)["image"]
    fixture_path = svc.keys_path

    # watch a MUTABLE copy of the fixture gallery
    watched = tmp_path / "watched.hdf5"
    shutil.copy(fixture_path, watched)
    svc.reload_keys(str(watched))
    old_n = svc.keys.n

    def write_gallery(n):
        rng = np.random.default_rng(n)
        feats = rng.normal(size=(n, emb.shape[0])).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        save_embedding_export(str(watched), {
            "encoded_image_feature": feats,
            "label_list": [{lv: f"w_{lv}{i}" for lv in
                            ("order", "family", "genus", "species")}
                           for i in range(n)],
            "file_name_list": [f"w{i}.jpg" for i in range(n)]})

    def wait_for(pred, timeout=60.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return True
            time.sleep(0.05)
        return False

    svc.start_reload_watch(0.05)
    try:
        write_gallery(old_n + 3)
        assert wait_for(lambda: svc.keys.n == old_n + 3), \
            f"watcher never picked up the grown gallery (n={svc.keys.n})"

        # torn write: garbage bytes — every load attempt fails, old serves
        reloads_before = svc.reloads
        watched.write_bytes(b"not an hdf5 file")
        time.sleep(0.5)
        assert svc.keys.n == old_n + 3 and svc.reloads == reloads_before

        # a valid gallery lands: the watcher recovers on its own
        write_gallery(old_n + 5)
        assert wait_for(lambda: svc.keys.n == old_n + 5), \
            "watcher did not recover after the torn write"
    finally:
        svc.stop_reload_watch()
        svc.reload_keys(fixture_path)  # restore for later tests


def test_search_snapshots_gallery_across_reload(served, tmp_path):
    """A /reload landing between the device search and the label lookup must
    not pair old-gallery indices with new-gallery labels: search() snapshots
    self.keys once, so predictions come from the gallery that produced the
    indices."""
    from clibd_tpu.engine.extract import save_embedding_export

    svc, jpeg = served["service"], served["jpeg"]
    emb = svc.embed(image_bytes=jpeg)["image"]

    # new gallery: same planted row 0 but every label renamed — if search()
    # re-read self.keys after the swap, top-1 would say "swapped_species0"
    feats = np.asarray(
        [emb] + [r for r in np.eye(emb.shape[0], dtype=np.float32)[:5]])
    new_path = tmp_path / "swapped.hdf5"
    save_embedding_export(str(new_path), {
        "encoded_image_feature": feats,
        "label_list": [{lv: f"swapped_{lv}{i}" for lv in
                        ("order", "family", "genus", "species")}
                       for i in range(len(feats))],
        "file_name_list": [f"s{i}.jpg" for i in range(len(feats))]})

    old_path = svc.keys_path
    old_keys = svc.keys
    orig_search = old_keys.search

    def search_then_swap(queries, key_type, k):
        out = orig_search(queries, key_type, k)
        svc.reload_keys(str(new_path))  # lands before the label lookup
        return out

    old_keys.search = search_then_swap
    try:
        res = svc.search(image_bytes=jpeg, k=1)
        # indices came from the OLD gallery (row 0 planted, labels
        # "species0"), so the labels must too — even though svc.keys now
        # points at the swapped gallery
        assert res["image"]["predictions"][0]["species"] == "species0"
        assert svc.keys.labels["species"][0] == "swapped_species0"
    finally:
        old_keys.search = orig_search
        svc.reload_keys(old_path)  # restore for later tests


def test_keyset_selector_auto_policy(tmp_path):
    """selector='auto' resolves to approx only where the host re-rank
    restores exactness (int8 + oversample); exact otherwise.  CPU approx
    lowers exactly, so the search result is pinned too."""
    from clibd_tpu.engine.extract import save_embedding_export
    from clibd_tpu.engine.serve import KeySet

    rng = np.random.default_rng(9)
    feats = rng.normal(size=(32, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    path = tmp_path / "keys.hdf5"
    save_embedding_export(str(path), {
        "encoded_image_feature": feats,
        "label_list": [{lv: f"{lv}{i}" for lv in
                        ("order", "family", "genus", "species")}
                       for i in range(32)],
        "file_name_list": [f"{i}.jpg" for i in range(32)]})

    ks_auto = KeySet(str(path))
    assert ks_auto.selector == "exact"                            # fp32 auto
    assert ks_auto.rerank_oversample == 0                         # no host copy
    assert KeySet(str(path), dtype="int8").selector == "approx"   # rerank on
    assert KeySet(str(path), dtype="int8",
                  rerank_oversample=0).selector == "exact"        # no rerank
    ks = KeySet(str(path), dtype="int8", selector="exact")
    assert ks.selector == "exact"
    ks8 = KeySet(str(path), dtype="int8")
    sims, idx = ks8.search(feats[3][None] + 0.001, "encoded_image_feature", k=3)
    assert idx[0, 0] == 3 and sims[0, 0] > 0.99

    # fp32 + EXPLICIT approx keeps the host re-rank: the approx_max_k
    # selection speedup without approximate final results (results equal
    # the exact fp32 search — approx lowers exactly on CPU, and the
    # re-rank path must reproduce, not perturb, exact ordering)
    ks_fa = KeySet(str(path), selector="approx")
    assert ks_fa.selector == "approx" and ks_fa.rerank_oversample == 4
    assert "encoded_image_feature" in ks_fa._host_fp32
    q = feats[5][None] + 0.001
    s_exact, i_exact = ks_auto.search(q, "encoded_image_feature", k=3)
    s_fa, i_fa = ks_fa.search(q, "encoded_image_feature", k=3)
    np.testing.assert_array_equal(i_exact, i_fa)
    np.testing.assert_allclose(s_exact, s_fa, atol=1e-5)
    # explicit approx with rerank disabled: raw device ranks, no host copy
    ks_fa0 = KeySet(str(path), selector="approx", rerank_oversample=0)
    assert ks_fa0.rerank_oversample == 0 and not ks_fa0._host_fp32


@pytest.mark.slow
def test_soak_live_writers_and_clients():
    """tools/soak_serve.py end-to-end: concurrent /embed + /search load
    while a SUBPROCESS gallery writer cycles through all three production
    write patterns (long-lived append+flush, truncate-in-place, atomic
    os.replace).  Pass = writer never errors (the locking=False regression),
    zero 5xx, ≥2 auto-reloads, served gallery converges to the final
    written row count."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "soak_serve.py"),
         "--cpu", "--seconds", "14"],
        capture_output=True, text=True, timeout=600, cwd=repo)
    # returncode first: a crashed harness has no verdict line, and the
    # stderr tail is the diagnostic that matters then
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    verdict = json.loads(res.stdout.strip().splitlines()[-1])
    assert verdict["ok"] and verdict["requests"]["5xx"] == 0
    assert verdict["final_keys_served"] == verdict["final_keys_written"]
