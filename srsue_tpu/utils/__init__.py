"""Common runtime utilities (the TPU build's analogue of the reference's
ue/src/common: config, logging, metrics, buffer/packet helpers, JAX shims).
"""
