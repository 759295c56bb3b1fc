"""DeepSeek-OCR-2 TPU — a TPU-native (JAX/XLA/Pallas) reimplementation of the
capability set of huahuadeliaoliao/DeepSeek-OCR-2-burn, plus batched serving.

Layout:
- configs:    model/tokenizer/preprocessing constants
- io:         safetensors <-> JAX pytree weight I/O (PyTorch layout)
- models:     deepseek_v2 (LM), sam (ViT-B encoder), qwen2 (compressor), ocr2
- ops:        attention / rope / norms / moe / sampling (+ Pallas kernels)
- runtime:    KV cache, greedy generation, batched serving engine
- preprocess: host-side image pipeline (rotate, pad, dynamic tiling)
- parallel:   jax.sharding mesh + partition specs
"""

__version__ = "0.1.0"
