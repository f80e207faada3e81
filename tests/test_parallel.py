import jax
import pytest

from mvedit_tpu.parallel import dryrun


@pytest.mark.slow
def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    dryrun(8)


def test_dryrun_multichip_2():
    dryrun(2)
