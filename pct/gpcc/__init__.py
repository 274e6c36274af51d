from pct.gpcc.coder import encode_points, decode_points

__all__ = ["encode_points", "decode_points"]
