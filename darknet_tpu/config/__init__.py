from darknet_tpu.config.cfg import Section, parse_cfg_text, parse_cfg_file
from darknet_tpu.config.metadata import Metadata

__all__ = ["Section", "parse_cfg_text", "parse_cfg_file", "Metadata"]
