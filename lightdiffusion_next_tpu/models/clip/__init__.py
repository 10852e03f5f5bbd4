"""Text encoders: CLIP-L tokenizer + transformer, T5-XXL, Flux dual-CLIP."""
