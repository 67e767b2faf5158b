"""Shape-math tests (reference formula: cuda/ops.cuh:9-13)."""

import pytest

from resnetc_tpu.ops.shapes import conv_output_size


@pytest.mark.parametrize(
    "size,k,s,p,expected",
    [
        (224, 7, 2, 3, 112),  # ResNet stem conv
        (112, 3, 2, 1, 56),  # stem maxpool
        (56, 3, 1, 1, 56),  # stage-1 3x3
        (56, 3, 2, 1, 28),  # stage-2 downsample 3x3
        (56, 1, 2, 0, 28),  # downsample 1x1 stride 2
        (7, 7, 1, 0, 1),  # global avg pool
        (5, 3, 1, 0, 3),
        (5, 3, 2, 0, 2),
    ],
)
def test_conv_output_size(size, k, s, p, expected):
    assert conv_output_size(size, k, s, p) == expected


def test_conv_output_size_rejects_oversized_window():
    with pytest.raises(ValueError):
        conv_output_size(3, 7, 1, 0)


def test_conv_output_size_rejects_bad_stride():
    with pytest.raises(ValueError):
        conv_output_size(8, 3, 0, 1)
