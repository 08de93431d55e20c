from pcnerf_tpu.eval.metrics import chamfer_fscore, nn_dists_device  # noqa: F401
