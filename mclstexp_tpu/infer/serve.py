"""One-process model server: histology patch -> predicted expression, HTTP.

The reference has no serving story — "inference" means re-running a whole
eval script end to end per dataset (reference ``evel_her2st.py:120-226``).
This module is the deployment surface the rebuild adds, composed from the
same building blocks ``cli eval`` uses:

* the retrieval database (spot embeddings + expression profiles — phase B's
  key set, ``evel_her2st.py:150-156``) is built once and stays HBM-resident
  across requests;
* queries run the image tower in eval mode at bucket-padded static shapes —
  one compiled XLA program per power-of-two bucket, never one per request
  shape. Eval-mode BN makes zero-padding exact, so a response is bitwise
  independent of whatever else happens to be co-batched with it;
* prediction is the fused top-K + inverse-distance aggregation of
  ``ops/retrieval.py`` (auto-switches to the memory-bounded streaming scan
  past ~512M score elements, so million-spot databases serve within fixed
  memory);
* the HTTP layer is stdlib-only (ThreadingHTTPServer + JSON/base64): many
  client threads, one device — JAX serializes device work per process.

Deliberate divergence from the Visium eval path: the reference's
``TenxDataset`` applies RANDOM flips/rotations to every query patch even at
inference (reference ``dataset.py:316-325``, kept by the ``cli eval`` visium
preset via ``eval_time_augment``). A server must be deterministic — the same
patch gets the same prediction — so query patches are embedded exactly as
sent; only the ``raw_scale`` (0-255 input) quirk carries over.

Params/batch_stats are threaded through the jitted encoder as ARGUMENTS,
never closed over: closure device arrays become remote-compile-request
constants and the flagship's positional tables alone exceed the TPU
tunnel's request limit (HTTP 413; see CLAUDE.md / infer/embed.py).
"""

from __future__ import annotations

import base64
import functools
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np

from mclstexp_tpu.models.mclstexp import MclSTExp
from mclstexp_tpu.ops.retrieval import retrieve_and_aggregate


def _bucket_size(n: int, max_batch: int) -> int:
    """Smallest power-of-two >= n, capped at max_batch.

    The cap wins even when the next power of two overshoots it (e.g.
    ``_bucket_size(150, 200) == 200``, not 256): ``--max-batch`` exists to
    bound per-program HBM and compile size, so padded buckets must never
    exceed it."""
    return min(max_batch, 1 << max(n - 1, 0).bit_length())


@functools.lru_cache(maxsize=8)
def _make_image_encode(model: MclSTExp, raw_scale: bool):
    """One jitted eval-mode image-tower program per (model, raw_scale).

    Cached at module level so every PredictionService over the same model
    shares compiled executables (one per patch-count bucket)."""
    import jax
    import jax.numpy as jnp

    def encode(params, batch_stats, u8):
        x = u8.astype(jnp.float32)
        if not raw_scale:
            x = x / 255.0
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            method=type(model).encode_image,
        )

    return jax.jit(encode)


class PredictionService:
    """A loaded checkpoint + HBM-resident spot database answering queries.

    ``predict(patches_u8)`` is the reference's full inference pipeline per
    query batch — image tower -> projection -> top-K cosine retrieval ->
    1/d^p expression aggregation (``evel_her2st.py:74-84,174-187``) — as a
    long-lived service instead of a batch script.
    """

    def __init__(
        self,
        model: MclSTExp,
        params,
        batch_stats,
        key_emb,
        key_expr,
        *,
        top_k: int = 200,
        weight_ord: int = 1,
        raw_scale: bool = False,
        max_batch: int = 256,
        gene_names: Optional[Sequence[str]] = None,
        patch_size: Optional[int] = None,
        key_mask=None,
    ):
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.key_emb = jnp.asarray(key_emb, jnp.float32)
        self.key_expr = jnp.asarray(key_expr, jnp.float32)
        if self.key_emb.shape[0] != self.key_expr.shape[0]:
            raise ValueError(
                f"key embeddings ({self.key_emb.shape[0]}) and expressions "
                f"({self.key_expr.shape[0]}) disagree on database size"
            )
        self.key_mask = None
        n_active = int(self.key_emb.shape[0])
        if key_mask is not None:
            self.key_mask = jnp.asarray(key_mask, dtype=bool)
            if self.key_mask.shape != (self.key_emb.shape[0],):
                raise ValueError(
                    f"key_mask shape {self.key_mask.shape} must be "
                    f"({self.key_emb.shape[0]},)"
                )
            n_active = int(np.asarray(self.key_mask).sum())
            if n_active == 0:
                raise ValueError("key_mask deactivates every database row")
        self.n_active = n_active  # computed once; info() reuses it (a
        # device readback per /healthz would serialize against predict work)
        # K can't exceed the retrievable database (reference K=200 assumes
        # >=200 keys).
        self.top_k = min(top_k, n_active)
        self.weight_ord = weight_ord
        self.raw_scale = raw_scale
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.max_batch = max_batch
        self.gene_names = list(gene_names) if gene_names is not None else None
        # Every (H, W) shape compiles its own XLA program (~25s each over the
        # TPU tunnel) and off-size patches are out of distribution, so pin
        # the training patch size and 400 mismatches instead.
        self.patch_size = None if patch_size is None else int(patch_size)
        # Forward-only path: rebind slow dense-block materializations the
        # same way the eval sweep does (infer/embed._eval_model — piecewise
        # without a backward pass loses to concat, PROFILE_r03.md).
        from mclstexp_tpu.infer.embed import _eval_model

        self._encode = _make_image_encode(_eval_model(model), raw_scale)

    @classmethod
    def from_sections(
        cls,
        model: MclSTExp,
        params,
        batch_stats,
        sections,
        *,
        batch_size: int = 32,
        exclude_section: Optional[int] = None,
        **kwargs,
    ) -> "PredictionService":
        """Build the database by embedding ``sections``' spot side under this
        checkpoint (the reference's phase-A spot sweep, B=32 batch-as-sequence
        parity semantics) and pairing it with their expression profiles.

        ``exclude_section`` masks one section's rows out of retrieval while
        STILL embedding all sections together — the LOO protocol embeds the
        full concatenation and excludes the held-out section afterward via a
        key mask (infer/evaluate.py:61-95); dropping the section before the
        sweep would shift B=32 batch boundaries and change every remaining
        key's embedding (batch-as-sequence is parity-load-bearing,
        reference ``evel_her2st.py:66-69``).

        Spot-tower only: no image sweep runs and no patches are uploaded
        (``tower="spot"`` skips the dominant H2D byte count) — sections
        loaded ``with_patches=False`` work."""
        from mclstexp_tpu.infer import embed

        if exclude_section is not None and not 0 <= exclude_section < len(sections):
            # validate BEFORE the sweep — the B=32 spot sweep is minutes over
            # the remote-TPU tunnel at her2st scale
            raise ValueError(
                f"exclude_section {exclude_section} out of range for "
                f"{len(sections)} sections"
            )
        _, spot = embed.compute_embeddings(
            model, params, batch_stats, sections, batch_size,
            as_device=True, tower="spot",
        )
        # Key profiles use the eval-protocol normalization (per-gene where
        # counts exist — phase B's matrices, Section.eval_expression).
        expr = np.concatenate([s.eval_expression for s in sections], axis=0)
        if exclude_section is not None:
            sizes = [s.expression.shape[0] for s in sections]
            mask = np.ones(sum(sizes), bool)
            start = sum(sizes[:exclude_section])
            mask[start:start + sizes[exclude_section]] = False
            kwargs["key_mask"] = mask
        return cls(model, params, batch_stats, spot, expr, **kwargs)

    @property
    def num_keys(self) -> int:
        return int(self.key_emb.shape[0])

    @property
    def num_genes(self) -> int:
        return int(self.key_expr.shape[1])

    def _check_patches(self, patches_u8: np.ndarray) -> np.ndarray:
        patches = np.ascontiguousarray(patches_u8)
        if patches.dtype != np.uint8:
            raise ValueError(f"patches must be uint8, got {patches.dtype}")
        if patches.ndim != 4 or patches.shape[-1] != 3:
            raise ValueError(
                f"patches must be (B, H, W, 3) NHWC uint8, got {patches.shape}"
            )
        if patches.shape[0] == 0:
            raise ValueError("empty batch: need at least one patch")
        if self.patch_size is not None and (
            patches.shape[1] != self.patch_size
            or patches.shape[2] != self.patch_size
        ):
            raise ValueError(
                f"patches must be {self.patch_size}x{self.patch_size} (the "
                f"model's training patch size), got "
                f"{patches.shape[1]}x{patches.shape[2]}"
            )
        return patches

    def embed_patches(self, patches_u8: np.ndarray) -> np.ndarray:
        """(B, P) image-tower embeddings; B is free (bucketed internally)."""
        import jax.numpy as jnp

        patches = self._check_patches(patches_u8)
        n = patches.shape[0]
        out = []
        for start in range(0, n, self.max_batch):
            chunk = patches[start:start + self.max_batch]
            b = chunk.shape[0]
            bucket = _bucket_size(b, self.max_batch)
            if b < bucket:
                pad = np.zeros((bucket - b, *chunk.shape[1:]), np.uint8)
                chunk = np.concatenate([chunk, pad], axis=0)
            emb = self._encode(self.params, self.batch_stats, jnp.asarray(chunk))
            out.append(np.asarray(emb[:b]))
        return np.concatenate(out, axis=0)

    def predict(self, patches_u8: np.ndarray) -> np.ndarray:
        """(B, G) predicted expression for a batch of uint8 NHWC patches."""
        query = self.embed_patches(patches_u8)
        _, pred = retrieve_and_aggregate(
            self.key_emb, self.key_expr, query,
            top_k=self.top_k, weight_ord=self.weight_ord,
            key_mask=self.key_mask,
        )
        return pred

    def info(self) -> dict:
        return {
            "status": "ok",
            "num_keys": self.num_keys,
            "num_active_keys": self.n_active,
            "num_genes": self.num_genes,
            "top_k": self.top_k,
            "weight_ord": self.weight_ord,
            "max_batch": self.max_batch,
            "raw_scale": self.raw_scale,
            "encoder": self.model.config.encoder_name,
            "projection_dim": int(self.key_emb.shape[1]),
            **({"gene_names": self.gene_names} if self.gene_names else {}),
        }


def _decode_patches(payload: dict) -> np.ndarray:
    """Patches from a request body: raw-bytes base64 (fast path) or lists."""
    if "patches_b64" in payload:
        shape = payload.get("shape")
        if not isinstance(shape, list) or len(shape) != 4:
            raise ValueError("patches_b64 requires \"shape\": [B, H, W, 3]")
        raw = base64.b64decode(payload["patches_b64"])
        expected = int(np.prod(shape))
        if len(raw) != expected:
            raise ValueError(
                f"patches_b64 holds {len(raw)} bytes, shape implies {expected}"
            )
        return np.frombuffer(raw, np.uint8).reshape(shape)
    if "patches" in payload:
        return np.asarray(payload["patches"], dtype=np.uint8)
    raise ValueError("request needs \"patches\" (nested lists) or "
                     "\"patches_b64\" + \"shape\"")


def _encode_result(arr: np.ndarray, as_b64: bool) -> dict:
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    if as_b64:
        return {
            "result_b64": base64.b64encode(arr.tobytes()).decode("ascii"),
            "shape": list(arr.shape),
            "dtype": "float32",
        }
    return {"result": arr.tolist(), "shape": list(arr.shape)}


class _Handler(BaseHTTPRequestHandler):
    # the service rides on the server object (see make_server)
    def _reply(self, code: int, body: dict) -> None:
        data = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt, *args):  # stdlib default spams stderr per hit
        if getattr(self.server, "verbose", False):  # pragma: no cover
            super().log_message(fmt, *args)

    def do_GET(self):
        if self.path in ("/healthz", "/info"):
            self._reply(200, self.server.service.info())
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path not in ("/predict", "/embed"):
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
            patches = _decode_patches(payload)
            service = self.server.service
            if self.path == "/predict":
                result = service.predict(patches)
            else:
                result = service.embed_patches(patches)
        except (ValueError, KeyError, TypeError) as e:  # JSONDecodeError is a ValueError
            self._reply(400, {"error": str(e)})
            return
        except Exception as e:  # noqa: BLE001 — a handler-thread escape would
            # drop the connection with no HTTP response at all
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            return
        self._reply(200, _encode_result(result, bool(payload.get("b64"))))


def make_server(
    service: PredictionService, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """A ready-to-run HTTP server (``port=0`` binds an ephemeral port;
    the bound address is ``server.server_address``). Caller owns the loop:
    ``server.serve_forever()`` / ``server.shutdown()``."""
    server = ThreadingHTTPServer((host, port), _Handler)
    server.service = service
    return server
