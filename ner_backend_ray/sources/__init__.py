from .files import parse_files_batch, read_raw_files, SUPPORTED_EXTENSIONS

__all__ = ["parse_files_batch", "read_raw_files", "SUPPORTED_EXTENSIONS"]
