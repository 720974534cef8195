"""Vendored TEST-ONLY shim exposing Pillow's ``PIL.Image.open`` surface
over a real pure-Python PNG pixel decoder (VERDICT r4 #6).

This sandbox has no Pillow, so the full-codec branch of
``cht_sync_spark.functions.multimodal._real_decode_row`` (``from PIL
import Image`` → ``Image.open``) had never executed. This package sits on
``sys.path`` ONLY inside the pinning test and makes that branch run
against genuinely decoded pixels: stdlib ``zlib`` inflate of the IDAT
stream plus full scanline defiltering (all five PNG filter types), not a
header peek. It is deliberately NOT a Pillow replacement: 8-bit
non-interlaced PNG color types 0/2/4/6 only — anything else raises, so
callers fall back exactly as they would on a real Pillow decode failure.
"""
