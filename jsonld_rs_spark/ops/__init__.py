"""Large-scale training-data operators over the driver test tables."""
