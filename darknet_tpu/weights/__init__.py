from darknet_tpu.weights.io import load_weights, save_weights

__all__ = ["load_weights", "save_weights"]
