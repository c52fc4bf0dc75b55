from .label_studio import decode_rle, encode_rle, mask2rle, mask2annotation

__all__ = ["decode_rle", "encode_rle", "mask2rle", "mask2annotation"]
