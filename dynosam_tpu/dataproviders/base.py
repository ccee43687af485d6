"""Data-provider base interfaces + factory.

Reference parity: /root/reference/dynosam/include/dynosam/dataprovider/
DataProvider.hpp:26 (callback API), DataProviderFactory.hpp:37 (DatasetType
enum: KITTI=0, VIRTUAL_KITTI=1, CLUSTER=2, OMD=3, ARIA=4,
TARTAN_AIR_SHIBUYA=5, VIODE=6). The TPU rebuild replaces callbacks+queues
with plain iterators of (FrameInputs, GroundTruthFrame) that the pipeline
prefetches onto the device.
"""

from __future__ import annotations

import enum
from typing import Iterator, Optional, Protocol, Tuple

from dynosam_tpu.cv import camera as cam
from dynosam_tpu.frontend.types import FrameInputs, GroundTruthFrame


class DatasetType(enum.IntEnum):
    KITTI = 0
    VIRTUAL_KITTI = 1
    CLUSTER = 2
    OMD = 3
    ARIA = 4
    TARTAN_AIR_SHIBUYA = 5
    VIODE = 6
    SYNTHETIC = 100  # dense synthetic scenario (this framework's test asset)


class DataProvider(Protocol):
    def __len__(self) -> int: ...

    def intrinsics(self) -> cam.CameraIntrinsics: ...

    def frame(self, k: int) -> FrameInputs: ...

    def ground_truth(self, k: int) -> Optional[GroundTruthFrame]: ...

    def __iter__(self) -> Iterator[Tuple[FrameInputs, Optional[GroundTruthFrame]]]:
        for k in range(len(self)):  # pragma: no cover - protocol default
            yield self.frame(k), self.ground_truth(k)


def create_dataset(dataset_type: int, path: str, **kwargs):
    """DataProviderFactory analogue (DataProviderFactory.cc:54-110)."""
    t = DatasetType(dataset_type)
    if t == DatasetType.KITTI:
        from dynosam_tpu.dataproviders.kitti import KittiDataProvider

        return KittiDataProvider(path, **kwargs)
    if t == DatasetType.VIRTUAL_KITTI:
        import os

        from dynosam_tpu.dataproviders.vkitti import VirtualKittiDataProvider

        # native VKITTI-2 layout when the versioned folders exist; otherwise
        # fall back to the dyno-KITTI repack with png masks
        if any(d.startswith("vkitti_") for d in os.listdir(path)):
            return VirtualKittiDataProvider(path, **kwargs)
        from dynosam_tpu.dataproviders.kitti import KittiDataProvider

        kwargs.setdefault("mask_format", "png")
        return KittiDataProvider(path, **kwargs)
    if t == DatasetType.OMD:
        from dynosam_tpu.dataproviders.omd import OmdDataProvider

        return OmdDataProvider(path, **kwargs)
    if t == DatasetType.CLUSTER:
        from dynosam_tpu.dataproviders.clusterslam import (
            ClusterSlamDataProvider,
        )

        return ClusterSlamDataProvider(path, **kwargs)
    if t == DatasetType.TARTAN_AIR_SHIBUYA:
        from dynosam_tpu.dataproviders.tartanair import (
            TartanAirShibuyaDataProvider,
        )

        return TartanAirShibuyaDataProvider(path, **kwargs)
    if t == DatasetType.VIODE:
        from dynosam_tpu.dataproviders.viode import ViodeDataProvider

        return ViodeDataProvider(path, **kwargs)
    if t == DatasetType.ARIA:
        from dynosam_tpu.dataproviders.aria import ProjectAriaDataProvider

        return ProjectAriaDataProvider(path, **kwargs)
    raise NotImplementedError(
        f"Dataset type {t.name} is not implemented in dynosam_tpu."
    )
