"""User-facing apps: CLI, Gradio WebUI, preview/progress plumbing."""
