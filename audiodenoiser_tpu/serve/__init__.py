from audiodenoiser_tpu.serve.server import DenoiseService, make_http_server

__all__ = ["DenoiseService", "make_http_server"]
