"""Logging, checkpoint orchestration and render execution.

Mirror of reference network/logger.py:10-144: the Logger restores the latest
checkpoint on construction, writes scalar summaries every i_summary steps,
prints every i_print, renders the validation dataset every i_img, checkpoints
every i_checkpoint — and in eval mode (is_training=False) renders the whole
test dataset immediately.

Scalars always go to <target>/scalars.jsonl; TensorBoard event files are
written too when tensorboard is importable (set NERFTEX_NO_TENSORBOARD=1 to
skip the heavyweight import).
"""

import json
import os
import time
from typing import Any

import numpy as np

from nerftex_tpu.utils import util
from nerftex_tpu.utils.image import write_image
from nerftex_tpu.ops.interpolate import filtered_downsample
from nerftex_tpu.render.checkpoint import CheckpointManager


def _match_param_layout(model, saved):
    """Convert restored params between pytree- and flat-theta layouts
    (render/train.apply_flat_param_space) so `flat_params` can be toggled
    across a resume; pass-through when layouts already match."""
    saved_flat = hasattr(saved, "ndim") and getattr(saved, "ndim", None) == 1
    model_flat = getattr(model, "_unravel", None) is not None
    if saved_flat and not model_flat:
        from jax.flatten_util import ravel_pytree

        return ravel_pytree(model.params)[1](saved)
    if not saved_flat and model_flat:
        return model._ravel(saved)
    return saved


class Logger:
    def __init__(
        self,
        target_path: str,
        checkpoint_variables: dict,
        source_path: str = None,
        dataset=None,
        is_training: bool = True,
        renderer: Any = None,
        n_iters: int = 5e5,
        i_summary: int = 10,
        i_print: int = 100,
        i_img: int = 5e3,
        i_checkpoint: int = 1e3,
        max_to_keep: int = 3,
        keep_every_n_hours: int = 12,
        write_exr: bool = False,
        downsampling_factor: int = 1,
        i_trace: int = 0,
        trace_steps: int = 3,
        **kwargs,
    ) -> None:
        self.target_path = target_path
        self.source_path = source_path if source_path is not None else target_path
        self.dataset = dataset
        self.is_training = is_training
        self.renderer = renderer
        self.n_iters = int(n_iters)
        self.i_summary = int(i_summary)
        self.i_print = int(i_print)
        self.i_img = int(i_img)
        self.i_checkpoint = int(i_checkpoint)
        self.write_exr = write_exr
        self.downsampling_factor = downsampling_factor
        self.time_print = time.perf_counter()
        # Profiling: every i_trace steps capture a jax.profiler trace of the
        # next trace_steps steps under <target>/profile (0 = off).  The
        # reference has no profiler; its closest artifact is the wall-clock
        # print every i_print steps (logger.py:68-73).
        self.i_trace = int(i_trace)
        self.trace_steps = int(trace_steps)
        self._tracing_until = None

        # checkpoint_variables: {model_name: Model, ...} plus optionally
        # 'state': an object with mutable .opt_state/.step (train mode).
        self.models = {
            k: v for k, v in checkpoint_variables.items() if hasattr(v, "params")
        }
        self.state = checkpoint_variables.get("state")
        self.step = 0

        self.checkpoint_manager = CheckpointManager(
            os.path.join(self.source_path, "checkpoints"),
            max_to_keep=max_to_keep,
            keep_every_n_hours=keep_every_n_hours,
        )
        self._restore()

        self._summary_writer = None
        if is_training:
            os.makedirs(self.target_path, exist_ok=True)
            self._scalar_file = open(
                os.path.join(self.target_path, "scalars.jsonl"), "a"
            )
            if not os.environ.get("NERFTEX_NO_TENSORBOARD"):
                self._summary_writer = _try_tensorboard(self.target_path)
            self.imgs_path = os.path.join(self.target_path, "media/validation")
            os.makedirs(self.imgs_path, exist_ok=True)
        else:
            self._scalar_file = None
            self.imgs_path = os.path.join(self.target_path, "media/test")
            os.makedirs(self.imgs_path, exist_ok=True)
            self.render_images(self.imgs_path)

    # -- checkpointing --------------------------------------------------

    def _restore(self) -> None:
        saved = self.checkpoint_manager.restore_latest()
        if saved is None:
            return
        for name, model in self.models.items():
            if name in saved.get("models", {}):
                model.params = _match_param_layout(model, saved["models"][name])
        if self.state is not None and "extra" in saved:
            for key, value in saved["extra"].items():
                setattr(self.state, key, value)
            self.step = int(saved["extra"].get("step", 0))
        else:
            self.step = int(saved.get("extra", {}).get("step", self.step))
        print(f"Restored model{' & optimizer' if self.state else ''} from {self.checkpoint_manager.latest_checkpoint}.")

    def save_checkpoint(self, step: int) -> str:
        state = {"models": {k: m.params for k, m in self.models.items()}}
        extra = {"step": step}
        if self.state is not None:
            extra.update({k: v for k, v in vars(self.state).items()})
            extra["step"] = step
        state["extra"] = extra
        return self.checkpoint_manager.save(state, step)

    # -- per-step hook --------------------------------------------------

    def __call__(self, loss: dict) -> None:
        self.step += 1
        step = self.step

        if self.i_trace > 0:
            import jax

            if self._tracing_until is None and step % self.i_trace == 0:
                jax.profiler.start_trace(os.path.join(self.target_path, "profile"))
                self._tracing_until = step + self.trace_steps
            elif self._tracing_until is not None and step >= self._tracing_until:
                jax.profiler.stop_trace()
                self._tracing_until = None
                print(f"Wrote profiler trace to {os.path.join(self.target_path, 'profile')}.")

        if step % self.i_summary == 0:
            record = {"step": step}
            for key, value in loss.items():
                record[key] = float(value)
                if self._summary_writer is not None:
                    self._summary_writer.add_scalar(key, float(value), step)
            self._scalar_file.write(json.dumps(record) + "\n")
            self._scalar_file.flush()

        if step % self.i_print == 0:
            parts = [f"Step {step}"]
            for key, value in loss.items():
                parts.append(f"{key} {float(value):.3g}")
            parts.append(f"Duration {time.perf_counter() - self.time_print:.3g}")
            print(" | ".join(parts))
            self.time_print = time.perf_counter()

        if step % self.i_img == 0 and self.dataset is not None:
            print("Rendering validation images.")
            imgs = self.render_images(
                os.path.join(self.imgs_path, util.format_name("", step, self.n_iters, "")),
                return_imgs=self._summary_writer is not None,
            )
            if self._summary_writer is not None and imgs:
                for i, img in enumerate(imgs):
                    self._summary_writer.add_image(
                        f"Validation Rendering/{i}", np.asarray(img), step, dataformats="HWC"
                    )

        if step % self.i_checkpoint == 0:
            path = self.save_checkpoint(step)
            print(f"Saved checkpoint to {path}.")

    # -- rendering ------------------------------------------------------

    def render_images(self, imgs_path: str, return_imgs: bool = False):
        os.makedirs(imgs_path, exist_ok=True)

        max_idx = self.dataset.cardinality()
        if max_idx < 0:
            max_idx = 256

        imgs = []
        for i, data in enumerate(self.dataset):
            img = self.render_image(data)
            name = util.format_name("", i, max_idx, ".exr" if self.write_exr else ".png")
            self.write_image(os.path.join(imgs_path, name), img)
            if return_imgs:
                imgs.append(img)

        if return_imgs:
            return imgs

    def render_image(self, data: dict):
        pred = self.renderer(
            **data,
            composite_bkgd=self.dataset.composite_bkgd,
            bkgd_color=self.dataset.bkgd_color,
            training=False,
        )
        img = np.concatenate(
            [
                np.asarray(pred["color_pred"]).reshape(-1, 3),
                np.asarray(pred["alpha_pred"]).reshape(-1, 1),
            ],
            -1,
        ).reshape(self.dataset.height, self.dataset.width, 4)

        if self.downsampling_factor > 1:
            img = np.asarray(filtered_downsample(img, self.downsampling_factor))

        if not self.write_exr:
            eps = 1e-5
            img = np.concatenate([img[..., :3] / (img[..., 3:] + eps), img[..., 3:]], -1)

        return img

    def write_image(self, img_path: str, img) -> None:
        write_image(img_path, np.asarray(img))


def _try_tensorboard(path: str):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(path)
    except Exception:
        return None
