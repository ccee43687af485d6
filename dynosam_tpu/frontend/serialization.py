"""VisionPacket (de)serialization + offline frontend replay.

Reference parity: FLAGS_save_frontend_json / FLAGS_frontend_from_file
(/root/reference/dynosam/src/frontend/RGBDInstanceFrontendModule.cc:97-103,
PipelineManager.cc:283-313 — the reference's JSON/BSON frontend checkpointing,
partially disabled upstream as "Not reimplemented"). Here the packet stream is
stored as a single compressed .npz of stacked arrays — the frontend
"checkpoint" that lets the backend be re-run/re-tuned without re-tracking.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.frontend.types import TrackTable, VisionPacket


def _stack(packets: List[VisionPacket]):
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *packets)


def save_packets(path: str, packets: List[VisionPacket]) -> None:
    """Save a packet stream to one .npz (arrays stacked over frames)."""
    stacked = _stack(packets)
    flat, treedef = jax.tree.flatten(stacked)
    np.savez_compressed(
        path, n=len(packets), **{f"arr_{i}": a for i, a in enumerate(flat)}
    )


def load_packets(path: str) -> List[VisionPacket]:
    data = np.load(path)
    n = int(data["n"])
    template = VisionPacket.empty(1, 1, 1)  # structure source
    _, treedef = jax.tree.flatten(template)
    flat = [data[f"arr_{i}"] for i in range(treedef.num_leaves)]
    stacked = jax.tree.unflatten(treedef, flat)
    return [
        jax.tree.map(lambda x: jnp.asarray(x[k]), stacked) for k in range(n)
    ]


class PacketReplayProvider:
    """Feeds saved packets straight to a backend — offline frontend replay."""

    def __init__(self, path: str):
        self.packets = load_packets(path)

    def __len__(self):
        return len(self.packets)

    def __iter__(self):
        return iter(self.packets)


# ---------------------------------------------------------------------------
# Graph-state checkpointing (backend resume)
# ---------------------------------------------------------------------------

def save_graph_state(path: str, state) -> None:
    """Checkpoint a backend GraphState (or any flax pytree) to .npz."""
    flat, _ = jax.tree.flatten(state)
    np.savez_compressed(path, **{f"arr_{i}": np.asarray(a) for i, a in enumerate(flat)})


def load_graph_state(path: str, template):
    """Restore a pytree checkpoint into `template`'s structure."""
    data = np.load(path)
    flat, treedef = jax.tree.flatten(template)
    loaded = [jnp.asarray(data[f"arr_{i}"]) for i in range(len(flat))]
    return jax.tree.unflatten(treedef, loaded)
