"""Gradio WebUI.

Counterpart of app.py:1-1012 (Gradio Blocks: settings persistence, threaded
generation with preview polling, history gallery, memory panel, launch
modes). Gradio is an optional dependency — import is deferred so the engine
never requires it.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import List

from lightdiffusion_next_tpu.app.instance import app as app_instance

SETTINGS_FILE = "webui_settings.json"

DEFAULT_SETTINGS = {
    "prompt": "",
    "negative_prompt": "",
    "width": 512,
    "height": 512,
    "num_images": 1,
    "batch_size": 1,
    "hires_fix": False,
    "adetailer": False,
    "enhance_prompt": False,
    "img2img_enabled": False,
    "reuse_seed": False,
    "prio_speed": False,
    "autohdr": True,
    "realistic_model": False,
    "flux_enabled": False,
    "multiscale_preset": "disabled",
    "multiscale_enabled": True,
    "multiscale_intermittent": False,
    "multiscale_factor": 0.5,
    "multiscale_fullres_start": 3,
    "multiscale_fullres_end": 8,
    "keep_models_loaded": True,
    "enable_preview": True,
    "w8a8": None,  # None -> RuntimeConfig resolve_w8a8() (TPU on, CPU off)
    "sage_attention": False,
    "flux_scan": None,  # None -> resolve_flux_scan() (TPU on, CPU off)
    "fused_attn": None,  # None -> resolve_fused_attn() (TPU on, CPU off)
    "fused_ew": None,  # None -> resolve_fused_ew() (TPU on, CPU off)
    "packed_attn": None,  # None -> resolve_packed_attn() (TPU on, CPU off)
    "qkv_fuse": None,  # None -> resolve_qkv_fuse() (on everywhere)
}


def _resolve_default_w8a8() -> bool:
    """UI default for the W8A8 checkbox: the RuntimeConfig "auto" policy
    (on-TPU on, CPU off) unless the user saved an explicit choice."""
    from lightdiffusion_next_tpu import config as _config

    return _config.get_config().resolve_w8a8()


def _resolve_default_fused_attn() -> bool:
    """UI default for the fused-attention checkbox: the RuntimeConfig
    "auto" policy (on-TPU on, CPU off) unless the user saved a choice."""
    from lightdiffusion_next_tpu import config as _config

    return _config.get_config().resolve_fused_attn()


def _resolve_default_fused_ew() -> bool:
    """UI default for the fused-elementwise checkbox: the RuntimeConfig
    "auto" policy (on-TPU on, CPU off) unless the user saved a choice."""
    from lightdiffusion_next_tpu import config as _config

    return _config.get_config().resolve_fused_ew()


def _resolve_default_packed_attn() -> bool:
    """UI default for the head-packed attention checkbox: the RuntimeConfig
    "auto" policy (on-TPU on, CPU off) unless the user saved a choice."""
    from lightdiffusion_next_tpu import config as _config

    return _config.get_config().resolve_packed_attn()


def _resolve_default_qkv_fuse() -> bool:
    """UI default for the fused-QKV checkbox: the RuntimeConfig "auto"
    policy (on everywhere — identical math) unless the user saved a
    choice."""
    from lightdiffusion_next_tpu import config as _config

    return _config.get_config().resolve_qkv_fuse()


def _resolve_default_flux_scan() -> bool:
    """UI default for the scan-over-blocks checkbox: the RuntimeConfig
    "auto" policy (on-TPU on, CPU off) unless the user saved a choice."""
    from lightdiffusion_next_tpu import config as _config

    return _config.get_config().resolve_flux_scan()


def load_settings() -> dict:
    """webui_settings.json autoload (app.py:58-125 parity)."""
    try:
        with open(SETTINGS_FILE) as f:
            data = json.load(f)
        out = dict(DEFAULT_SETTINGS)
        out.update({k: v for k, v in data.items() if k in DEFAULT_SETTINGS})
        return out
    except Exception:
        return dict(DEFAULT_SETTINGS)


def save_settings(settings: dict) -> None:
    try:
        with open(SETTINGS_FILE, "w") as f:
            json.dump(settings, f, indent=2)
    except OSError:
        pass


# Concurrent-generation guard: one pipeline run at a time. A second
# Generate click while a run is active must not start a second thread
# sharing the global interrupt/progress state (the reference serializes
# through its generation_in_progress flow, app.py:312-464).
_GENERATION_LOCK = threading.Lock()


def generate_images_with_preview(
    output_dir: str = "./output",
    img2img_image=None,
    **kwargs,
):
    """Threaded generation with 0.5s preview polling (app.py:312-464
    parity). Yields (gallery_paths, status) tuples.

    Non-pipeline controls handled here: ``img2img_enabled`` +
    ``img2img_image`` (numpy array or path; routed through a temp file like
    app.py:382-387), ``enable_preview`` (app.py:624), and
    ``keep_models_loaded`` (app.py:619 / set_keep_models_loaded)."""
    from lightdiffusion_next_tpu.app.instance import PreviewHook
    from lightdiffusion_next_tpu.pipelines.pipeline import pipeline

    if not _GENERATION_LOCK.acquire(blocking=False):
        yield [], "busy: a generation is already in progress"
        return

    temp_img = None
    try:
        # merge-save (the full UI state is saved by the webui handler;
        # direct callers only update the keys they pass)
        merged = load_settings()
        merged.update({k: v for k, v in kwargs.items() if k in DEFAULT_SETTINGS})
        save_settings(merged)

        app_instance.previewer_enabled = bool(kwargs.pop("enable_preview", True))
        keep_loaded = bool(kwargs.pop("keep_models_loaded", True))
        from lightdiffusion_next_tpu.pipelines.loader import get_model_cache

        get_model_cache().set_keep_models_loaded(keep_loaded)

        if "w8a8" in kwargs or "sage_attention" in kwargs \
                or "flux_scan" in kwargs or "fused_attn" in kwargs \
                or "fused_ew" in kwargs or "packed_attn" in kwargs \
                or "qkv_fuse" in kwargs:
            # int8-MXU compute / scan-forward toggles (this framework's own)
            import dataclasses as _dc

            from lightdiffusion_next_tpu import config as _config

            cfg = _config.get_config()
            _config.set_config(_dc.replace(
                cfg,
                w8a8=bool(kwargs.pop("w8a8", cfg.resolve_w8a8())),
                sage_attention=bool(
                    kwargs.pop("sage_attention", cfg.sage_attention)
                ),
                flux_scan=bool(
                    kwargs.pop("flux_scan", cfg.resolve_flux_scan())
                ),
                fused_attn=bool(
                    kwargs.pop("fused_attn", cfg.resolve_fused_attn())
                ),
                fused_ew=bool(
                    kwargs.pop("fused_ew", cfg.resolve_fused_ew())
                ),
                packed_attn=bool(
                    kwargs.pop("packed_attn", cfg.resolve_packed_attn())
                ),
                qkv_fuse=bool(
                    kwargs.pop("qkv_fuse", cfg.resolve_qkv_fuse())
                ),
            ))

        img2img_enabled = bool(kwargs.pop("img2img_enabled", False))
        if img2img_enabled:
            if img2img_image is None:
                # don't silently fall back to txt2img on an empty upload
                yield [], "error: img2img is enabled but no input image was provided"
                return
            if isinstance(img2img_image, str):
                kwargs["prompt"] = img2img_image
            else:  # numpy array from gr.Image -> temp file (app.py:382-387)
                import numpy as np
                from PIL import Image

                os.makedirs(output_dir, exist_ok=True)
                temp_img = os.path.join(output_dir, "temp_img2img.png")
                Image.fromarray(np.asarray(img2img_image)).save(temp_img)
                kwargs["prompt"] = temp_img
            kwargs["img2img"] = True

        kwargs.setdefault("progress_callback", PreviewHook(app_instance))
        app_instance.clear_interrupt()
        app_instance.progress.set(0.0)
        result: dict = {}

        def run():
            try:
                result["paths"] = pipeline(output_dir=output_dir, **kwargs)
            except Exception as e:  # surface errors like the reference (app.py:452)
                result["error"] = str(e)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        while t.is_alive():
            previews = app_instance.get_latest_previews()
            yield previews, f"generating... {app_instance.progress.get():.0%}"
            time.sleep(0.5)
        t.join()
        if "error" in result:
            yield [], f"error: {result['error']}"
        else:
            yield result.get("paths", []), "done"
    finally:
        # If the client disconnected mid-run (generator closed at a yield),
        # the daemon pipeline thread is still sampling: releasing the lock
        # or deleting its input file now would let a second Generate run
        # concurrently against the shared interrupt/progress state. Hand
        # cleanup+release to a waiter that joins the worker first.
        def _cleanup_and_release():
            if temp_img is not None and os.path.exists(temp_img):
                try:
                    os.remove(temp_img)
                except OSError:
                    pass
            _GENERATION_LOCK.release()

        worker = locals().get("t")
        if worker is not None and worker.is_alive():
            def _wait_then_release():
                worker.join()
                _cleanup_and_release()

            threading.Thread(target=_wait_then_release, daemon=True).start()
        else:
            _cleanup_and_release()


def list_history(output_dir: str = "./output") -> List[str]:
    out = []
    for root, _dirs, files in os.walk(output_dir):
        # exclude only the preview DIRECTORY itself (a substring test would
        # hide any workflow subfolder whose name merely contains "preview")
        if os.path.basename(root) == "preview":
            continue
        for f in sorted(files):
            if f.endswith(".png"):
                out.append(os.path.join(root, f))

    def mtime(p: str) -> float:
        # a file deleted between the walk and the sort (concurrent clear /
        # second session) must not blow up the history handler
        try:
            return os.path.getmtime(p)
        except OSError:
            return 0.0

    return sorted(out, key=mtime, reverse=True)


def select_from_history(paths: List[str], index) -> str:
    """Map a gallery select event's index to the real history path. Gradio
    serves gallery images from its own temp cache, so the event's *value*
    path is useless (and basenames collide across workflow subfolders —
    every folder counts LD_NNNNN_.png); the index into the listing the
    gallery was last rendered from is the only reliable handle."""
    try:
        i = int(index)
    except (TypeError, ValueError):
        return ""
    if 0 <= i < len(paths):
        return paths[i]
    return ""


def delete_history_image(path: str, output_dir: str = "./output") -> str:
    """Remove one generated image (app.py:212-282 capability). Refuses
    paths outside ``output_dir`` so a stale gallery entry can never delete
    an arbitrary file."""
    if not path:
        return "no image selected"
    real = os.path.realpath(path)
    base = os.path.realpath(output_dir)
    if not real.startswith(base + os.sep):
        return f"refusing to delete outside {output_dir}: {path}"
    try:
        os.remove(real)
        return f"deleted {os.path.basename(real)}"
    except OSError as e:
        return f"error deleting {os.path.basename(real)}: {e}"


def clear_history(output_dir: str = "./output") -> str:
    """Delete every generated PNG under ``output_dir`` (app.py:284-304
    capability)."""
    n = 0
    errors = 0
    for p in list_history(output_dir):
        try:
            os.remove(p)
            n += 1
        except OSError:
            errors += 1
    msg = f"deleted {n} image(s)"
    if errors:
        msg += f", {errors} failed"
    return msg


def multiscale_kwargs(
    preset: str,
    enabled: bool,
    intermittent: bool,
    factor: float,
    fullres_start: int,
    fullres_end: int,
) -> dict:
    """Map the multiscale accordion to pipeline() kwargs (app.py:326-372
    capability): a named preset wins; "custom" passes the individual
    fields; "disabled" turns multi-scale off."""
    if preset == "custom":
        return {
            "enable_multiscale": bool(enabled),
            "multiscale_intermittent_fullres": bool(intermittent),
            "multiscale_factor": float(factor),
            "multiscale_fullres_start": int(fullres_start),
            "multiscale_fullres_end": int(fullres_end),
        }
    if preset == "disabled":
        return {"enable_multiscale": False}
    return {"multiscale_preset": preset}


def memory_info() -> str:
    from lightdiffusion_next_tpu.pipelines.loader import get_model_cache

    info = get_model_cache().get_memory_info()
    gib = 1024**3
    if "bytes_in_use" in info:
        return (
            f"HBM {info['bytes_in_use']/gib:.2f} / {info.get('bytes_limit',0)/gib:.2f} GiB"
            f" · {info['cached_models']} cached model(s)"
        )
    return f"{info['cached_models']} cached model(s)"


def build_app():
    """Construct the Gradio Blocks app (requires `gradio`)."""
    import gradio as gr

    s = load_settings()
    with gr.Blocks(title="LightDiffusion-TPU") as demo:
        with gr.Row():
            with gr.Column():
                prompt = gr.Textbox(label="Prompt", value=s["prompt"], lines=3)
                negative = gr.Textbox(
                    label="Negative prompt", value=s["negative_prompt"], lines=2
                )
                with gr.Row():
                    width = gr.Slider(256, 2048, value=s["width"], step=64, label="Width")
                    height = gr.Slider(256, 2048, value=s["height"], step=64, label="Height")
                with gr.Row():
                    num_images = gr.Slider(1, 8, value=s["num_images"], step=1, label="Images")
                    batch_size = gr.Slider(1, 4, value=s["batch_size"], step=1, label="Batch")
                with gr.Row():
                    hires = gr.Checkbox(value=s["hires_fix"], label="Hires fix")
                    adet = gr.Checkbox(value=s["adetailer"], label="ADetailer")
                    enh = gr.Checkbox(value=s["enhance_prompt"], label="Enhance prompt")
                with gr.Row():
                    speed = gr.Checkbox(value=s["prio_speed"], label="Prioritize speed")
                    hdr = gr.Checkbox(value=s["autohdr"], label="AutoHDR")
                    realistic = gr.Checkbox(value=s["realistic_model"], label="Realistic model")
                    flux = gr.Checkbox(value=s["flux_enabled"], label="Flux")
                with gr.Row():
                    reuse_seed = gr.Checkbox(
                        value=s["reuse_seed"], label="Reuse seed"
                    )
                    keep_loaded = gr.Checkbox(
                        value=s["keep_models_loaded"],
                        label="Keep models loaded",
                        info="Keep models resident for instant reuse",
                    )
                    preview_on = gr.Checkbox(
                        value=s["enable_preview"],
                        label="Real-time preview",
                        info="TAESD previews during generation",
                    )
                    w8a8 = gr.Checkbox(
                        value=(_resolve_default_w8a8()
                               if s["w8a8"] is None else s["w8a8"]),
                        label="W8A8 int8 compute (Flux)",
                        info="int8-MXU matmuls; measured -18.5% s/image on "
                             "TPU (default on there), latent RMSE 1.5%",
                    )
                    sage_attn = gr.Checkbox(
                        value=s["sage_attention"],
                        label="Int8 attention",
                        info="SageAttention-style int8 QK/PV; 2x MXU rate "
                             "at SD1.5 head dims",
                    )
                    flux_scan = gr.Checkbox(
                        value=(_resolve_default_flux_scan()
                               if s["flux_scan"] is None else s["flux_scan"]),
                        label="Flux scan-over-blocks",
                        info="7.2x smaller program, measured 2x faster cold "
                             "compile and -4% s/image on TPU (default on "
                             "there); disable when patching Flux with a LoRA",
                    )
                    fused_attn = gr.Checkbox(
                        value=(_resolve_default_fused_attn()
                               if s["fused_attn"] is None
                               else s["fused_attn"]),
                        label="Fused-prologue attention (Flux)",
                        info="QKNorm+RoPE+head indexing in-kernel; "
                             "measured -16% s/image on TPU (default on "
                             "there), latent RMSE 0.56%",
                    )
                    fused_ew = gr.Checkbox(
                        value=(_resolve_default_fused_ew()
                               if s["fused_ew"] is None
                               else s["fused_ew"]),
                        label="Fused elementwise (Flux W8A8)",
                        info="LN/modulation/gelu row-quant prologue and "
                             "gate/bias/residual epilogue inside the W8A8 "
                             "matmul kernels; measured -10.6% s/image "
                             "(default on TPU), latent RMSE 0.74%",
                    )
                    packed_attn = gr.Checkbox(
                        value=(_resolve_default_packed_attn()
                               if s["packed_attn"] is None
                               else s["packed_attn"]),
                        label="Head-packed attention (SD1.5)",
                        info="3 heads per 128-lane MXU tile at d=40; "
                             "kernel 1.05-1.17x after the VPU-lean "
                             "softmax (default on TPU), zero drift",
                    )
                    qkv_fuse = gr.Checkbox(
                        value=(_resolve_default_qkv_fuse()
                               if s["qkv_fuse"] is None
                               else s["qkv_fuse"]),
                        label="Fused QKV projection (UNet)",
                        info="one wide q|k|v matmul instead of three "
                             "narrow ones; identical math (default on)",
                    )
                with gr.Row():
                    img2img = gr.Checkbox(
                        value=s["img2img_enabled"], label="Image to image"
                    )
                img2img_image = gr.Image(
                    label="Input image for img2img",
                    visible=bool(s["img2img_enabled"]),
                )
                # input visible only when img2img is on (app.py:684-686)
                img2img.change(
                    fn=lambda x: gr.update(visible=x),
                    inputs=[img2img],
                    outputs=[img2img_image],
                )
                with gr.Accordion("Multi-scale diffusion", open=False):
                    ms_preset = gr.Dropdown(
                        ["custom", "disabled", "quality", "performance",
                         "balanced"],
                        value=s["multiscale_preset"],
                        label="Preset (custom = use fields below)",
                    )
                    ms_enabled = gr.Checkbox(
                        value=s["multiscale_enabled"], label="Enable multi-scale"
                    )
                    ms_intermittent = gr.Checkbox(
                        value=s["multiscale_intermittent"],
                        label="Intermittent full-res",
                    )
                    ms_factor = gr.Slider(
                        0.1, 1.0, value=s["multiscale_factor"], step=0.05,
                        label="Scale factor",
                    )
                    ms_start = gr.Slider(
                        0, 10, value=s["multiscale_fullres_start"], step=1,
                        label="Full-res start steps",
                    )
                    ms_end = gr.Slider(
                        0, 10, value=s["multiscale_fullres_end"], step=1,
                        label="Full-res end steps",
                    )
                with gr.Row():
                    go = gr.Button("Generate", variant="primary")
                    stop = gr.Button("Interrupt")
            with gr.Column():
                gallery = gr.Gallery(label="Output")
                status = gr.Textbox(label="Status", interactive=False)
                mem = gr.Textbox(label="Memory", value=memory_info(), interactive=False)
                with gr.Row():
                    refresh_mem = gr.Button("Refresh memory")
                    clear_cache = gr.Button("Clear model cache")
                initial_history = list_history()
                history = gr.Gallery(label="History", value=initial_history)
                with gr.Row():
                    refresh_hist = gr.Button("Refresh history")
                    delete_img = gr.Button("Delete selected image")
                    clear_all = gr.Button("Clear all images", variant="stop")
                action_status = gr.Textbox(
                    label="History actions", interactive=False
                )
                selected_path = gr.State("")
                history_paths = gr.State(initial_history)

        def on_generate(
            prompt, negative, width, height, num_images, batch_size, hires,
            adet, enh, speed, hdr, realistic, flux, reuse, keep, prev,
            use_w8a8, use_sage, use_flux_scan, use_fused, use_fused_ew,
            use_packed, use_qkv_fuse, i2i_enabled, i2i_image, ms_preset,
            ms_enabled, ms_intermittent, ms_factor, ms_start, ms_end,
        ):
            ms_kwargs = multiscale_kwargs(
                ms_preset, ms_enabled, ms_intermittent, ms_factor, ms_start,
                ms_end,
            )
            save_settings(
                {
                    "prompt": prompt,
                    "negative_prompt": negative,
                    "width": int(width),
                    "height": int(height),
                    "num_images": int(num_images),
                    "batch_size": int(batch_size),
                    "hires_fix": hires,
                    "adetailer": adet,
                    "enhance_prompt": enh,
                    "img2img_enabled": bool(i2i_enabled),
                    "reuse_seed": bool(reuse),
                    "prio_speed": speed,
                    "autohdr": hdr,
                    "realistic_model": realistic,
                    "flux_enabled": flux,
                    "multiscale_preset": ms_preset,
                    "multiscale_enabled": bool(ms_enabled),
                    "multiscale_intermittent": bool(ms_intermittent),
                    "multiscale_factor": float(ms_factor),
                    "multiscale_fullres_start": int(ms_start),
                    "multiscale_fullres_end": int(ms_end),
                    "keep_models_loaded": bool(keep),
                    "enable_preview": bool(prev),
                    "w8a8": bool(use_w8a8),
                    "sage_attention": bool(use_sage),
                    "flux_scan": bool(use_flux_scan),
                    "fused_attn": bool(use_fused),
                    "fused_ew": bool(use_fused_ew),
                    "packed_attn": bool(use_packed),
                    "qkv_fuse": bool(use_qkv_fuse),
                }
            )
            paths, state = [], "starting"
            for paths, state in generate_images_with_preview(
                prompt=prompt,
                negative_prompt=negative or None,
                w=int(width),
                h=int(height),
                number=int(num_images),
                batch=int(batch_size),
                hires_fix=hires,
                adetailer=adet,
                enhance_prompt=enh,
                reuse_seed=bool(reuse),
                keep_models_loaded=bool(keep),
                enable_preview=bool(prev),
                w8a8=bool(use_w8a8),
                sage_attention=bool(use_sage),
                flux_scan=bool(use_flux_scan),
                fused_attn=bool(use_fused),
                fused_ew=bool(use_fused_ew),
                packed_attn=bool(use_packed),
                qkv_fuse=bool(use_qkv_fuse),
                img2img_enabled=bool(i2i_enabled),
                img2img_image=i2i_image,
                prio_speed=speed,
                autohdr=hdr,
                realistic_model=realistic,
                flux_enabled=flux,
                **ms_kwargs,
            ):
                yield paths, state, gr.update(), gr.update()
            # refresh the history tab with the finished images (the
            # reference reloads its gallery from disk, app.py:438-450)
            listing = list_history()
            yield paths, state, listing, listing

        go.click(
            on_generate,
            [prompt, negative, width, height, num_images, batch_size, hires,
             adet, enh, speed, hdr, realistic, flux, reuse_seed, keep_loaded,
             preview_on, w8a8, sage_attn, flux_scan, fused_attn, fused_ew,
             packed_attn, qkv_fuse, img2img, img2img_image, ms_preset,
             ms_enabled, ms_intermittent, ms_factor, ms_start, ms_end],
            [gallery, status, history, history_paths],
        )

        def on_refresh_history():
            # manual refresh (app.py:749 Refresh History)
            listing = list_history()
            return listing, listing

        refresh_hist.click(on_refresh_history, None, [history, history_paths])
        refresh_mem.click(lambda: memory_info(), None, mem)
        stop.click(lambda: app_instance.request_interrupt(), None, None)

        def on_clear():
            from lightdiffusion_next_tpu.pipelines.loader import get_model_cache

            get_model_cache().clear()
            return memory_info()

        clear_cache.click(on_clear, None, mem)

        def on_select(paths, evt: gr.SelectData):
            return select_from_history(paths, evt.index)

        history.select(on_select, history_paths, selected_path)

        def on_delete(path):
            msg = delete_history_image(path)
            listing = list_history()
            return msg, listing, listing, ""

        delete_img.click(
            on_delete,
            selected_path,
            [action_status, history, history_paths, selected_path],
        )

        def on_clear_all():
            listing_msg = clear_history()
            listing = list_history()
            return listing_msg, listing, listing, ""

        clear_all.click(
            on_clear_all,
            None,
            [action_status, history, history_paths, selected_path],
        )
    return demo


def main():
    """Launch modes (app.py:944-979 parity): HF Spaces (SPACE_ID ->
    0.0.0.0:7860), Docker (GRADIO_SERVER_* env), local default. The
    reference's local mode enables share=True; we default it OFF — an
    unasked-for public tunnel is a footgun — opt in with LDT_SHARE=1."""
    demo = build_app()
    os.makedirs("./output/preview", exist_ok=True)
    if "SPACE_ID" in os.environ:  # Hugging Face Space
        demo.launch(server_name="0.0.0.0", server_port=7860)
    elif "GRADIO_SERVER_NAME" in os.environ and "GRADIO_SERVER_PORT" in os.environ:
        # Docker: the reference requires BOTH vars for this mode; a bare
        # GRADIO_SERVER_PORT must NOT silently rebind from localhost to
        # 0.0.0.0 (the UI has delete/clear handlers)
        demo.launch(
            server_name=os.environ["GRADIO_SERVER_NAME"],
            server_port=int(os.environ["GRADIO_SERVER_PORT"]),
        )
    else:
        demo.launch(
            server_name="127.0.0.1",
            server_port=int(
                os.environ.get("GRADIO_SERVER_PORT", os.environ.get("LDT_PORT", "7860"))
            ),
            share=os.environ.get("LDT_SHARE") == "1",
        )


if __name__ == "__main__":
    main()
