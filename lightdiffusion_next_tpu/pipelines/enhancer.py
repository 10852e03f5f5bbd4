"""Ollama prompt enhancement.

Counterpart of src/Utilities/Enhancer.py:7-75: chat with a local Ollama
deepseek-r1, strip <think> blocks, prefix quality tags. Implemented over raw
HTTP (the `ollama` package is not a baked dependency) and failure-tolerant —
the reference swallows errors the same way (pipeline.py:109-113).
"""

from __future__ import annotations

import json
import re
import urllib.request

SYSTEM_PROMPT = (
    "You are a prompt maker for Stable Diffusion. Expand the user's idea "
    "into a single detailed, comma-separated prompt describing subject, "
    "environment, lighting, style and quality tags. Reply with the prompt "
    "only."
)

QUALITY_PREFIX = "masterpiece, best quality, "


def enhance_prompt(
    prompt: str,
    model: str = "deepseek-r1",
    host: str = "http://127.0.0.1:11434",
    timeout: float = 30.0,
) -> str:
    """Returns the enhanced prompt, or the original on any failure."""
    try:
        req = urllib.request.Request(
            f"{host}/api/chat",
            data=json.dumps(
                {
                    "model": model,
                    "stream": False,
                    "messages": [
                        {"role": "system", "content": SYSTEM_PROMPT},
                        {"role": "user", "content": prompt},
                    ],
                }
            ).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            data = json.loads(resp.read().decode("utf-8"))
        text = data["message"]["content"]
        # strip chain-of-thought blocks (Enhancer.py <think> handling)
        text = re.sub(r"<think>.*?</think>", "", text, flags=re.DOTALL).strip()
        if not text:
            return prompt
        return QUALITY_PREFIX + text
    except Exception:
        return prompt
