r"""Checkpoint save/load (orbax).

Equivalent of the reference two-file scheme
(`/root/reference/geotransformer/engine/base_trainer.py:112-177`):
per-milestone checkpoints ("epoch-N") plus a rolling latest snapshot that
includes optimizer state, all under one orbax CheckpointManager. Process-0
writes; restore is collective.
"""

import os

import numpy as np
import orbax.checkpoint as ocp


def _as_saveable(tree):
    import jax

    return jax.tree.map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, directory, max_to_keep=None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        )
        self._manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step, state, metadata=None):
        """Save a TrainState (+ optional JSON-able metadata) at `step`."""
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(_as_saveable(state)),
            **(
                {"metadata": ocp.args.JsonSave(metadata)}
                if metadata is not None
                else {}
            ),
        )
        self._manager.save(step, args=args)
        self._manager.wait_until_finished()

    def latest_step(self):
        return self._manager.latest_step()

    def restore(self, state_template, step=None):
        """Restore into the structure of `state_template`. Returns (state, step)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        restored = self._manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(_as_saveable(state_template))
            ),
        )
        import jax
        import jax.numpy as jnp

        state = jax.tree.map(jnp.asarray, restored["state"])
        return state, step

    def close(self):
        self._manager.close()
