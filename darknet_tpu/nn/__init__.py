from darknet_tpu.nn.network import Network

__all__ = ["Network"]
