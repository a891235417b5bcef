from mclstexp_tpu.models.image.registry import build_encoder, ENCODERS  # noqa: F401
