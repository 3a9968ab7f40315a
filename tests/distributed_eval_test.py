"""Distributed eval on the 8-device CPU mesh matches serial eval exactly."""

import numpy as np
import pytest

from speech_tpu.data.preprocessor import Preprocessor
from speech_tpu.data.loader import make_loader
from speech_tpu.models import build_model
from speech_tpu.parallel import make_mesh
from speech_tpu.parallel.eval import distributed_eval
from speech_tpu.training import trainer


MODEL_CFG = {
    "class": "CTC",
    "dropout": 0.0,
    "encoder": {
        "conv": [[8, 5, 31, 2]],
        "rnn": {"dim": 16, "layers": 1, "bidirectional": True},
    },
}


def test_distributed_eval_matches_serial(tiny_corpus):
    import jax

    preproc = Preprocessor(tiny_corpus["manifest"], start_and_end=False)
    model = build_model(MODEL_CFG, preproc)
    params = trainer.init_params(model, preproc.input_dim,
                                 jax.random.PRNGKey(0))

    serial_loader = make_loader(tiny_corpus["manifest"], preproc, batch_size=3,
                                drop_last=False, time_mult=20, label_mult=4)
    serial_loss, serial_cer = trainer.eval_dev(model, params, serial_loader,
                                               preproc, verbose=False)

    mesh = make_mesh(n_data=8)
    dist_loader = make_loader(tiny_corpus["manifest"], preproc, batch_size=3,
                              drop_last=False, time_mult=20, label_mult=4)
    # batch=3 is not divisible by 8 -> exercises pad_batch_to_multiple
    dist_loss, dist_cer = distributed_eval(model, params, dist_loader, preproc,
                                           mesh)
    np.testing.assert_allclose(dist_cer, serial_cer, rtol=1e-6)
    # loss differs slightly: padded zero-length rows enter the batch mean
    assert np.isfinite(dist_loss)
