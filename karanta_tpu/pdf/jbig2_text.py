"""JBIG2 symbol dictionaries + text regions (T.88 6.4/6.5) — stub."""
from karanta_tpu.pdf.jbig2 import JBIG2Error


def decode_symbol_dict(data, inherited, custom_tables):
    raise JBIG2Error("symbol dictionary decoding not yet implemented")


def decode_text_region(data, symbols, custom_tables):
    raise JBIG2Error("text region decoding not yet implemented")


def parse_custom_table(data):
    raise JBIG2Error("custom table decoding not yet implemented")
