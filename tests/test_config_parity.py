"""Constants-parity sweep: every config default asserted against the value in
the cited reference script (VERDICT.md round 1, next-round item 2).

Each expected value below was read from the reference constants block named in
the comment; if a default drifts, the failing assertion names the file:line to
re-check.
"""

from openpystruct_tpu.config import (
    DATAGEN_OPT,
    BeamConfig,
    FrameConfig,
    OptimizerConfig,
    ScenarioConfig,
    TrainConfig,
)
from openpystruct_tpu.families import BNN_KL_SCALE, FAMILIES, PINN_PENALTY


def test_beam_config_matches_beamopt():
    # OpenPyStruct_BeamOpt.py:24-37
    cfg = BeamConfig()
    assert cfg.E == 200e9
    assert cfg.nu == 0.3
    assert cfg.A == 0.01
    assert cfg.L == 200.0
    assert cfg.num_nodes == 101
    assert cfg.I0 == 0.5
    assert cfg.udl == -5000.0
    assert cfg.G == 200e9 / (2 * 1.3)


def test_optimizer_config_matches_beamopt():
    # OpenPyStruct_BeamOpt.py:40-48
    cfg = OptimizerConfig()
    assert cfg.max_epochs == 1000
    assert cfg.lr == 0.01
    assert cfg.lr_gamma == 0.98
    assert cfg.alpha_moment == 1e-2
    assert cfg.alpha_shear == 1e-2
    assert cfg.tolerance == 1e-2
    assert cfg.patience == 10
    assert cfg.clamp_min == 1e-8


def test_datagen_opt_matches_multicore():
    # OpenPyStruct_BeamOpt_training_MultiCore.py:36-44
    assert DATAGEN_OPT.max_epochs == 600
    assert DATAGEN_OPT.tolerance == 5e-3
    assert DATAGEN_OPT.patience == 5
    assert DATAGEN_OPT.lr == 0.01
    assert DATAGEN_OPT.lr_gamma == 0.98


def test_scenario_config_matches_multicore():
    # OpenPyStruct_BeamOpt_training_MultiCore.py:20-70
    cfg = ScenarioConfig()
    assert cfg.num_nodes == 101
    assert cfg.n_rollers_max == 4
    assert cfg.m_forces_max == 4
    assert cfg.L_max == 200.0
    assert cfg.L_min == 15.0
    assert cfg.max_force == -355857.0
    assert cfg.min_force == -355857.0 / 10
    assert cfg.udl == -1000.0
    assert cfg.fixed_roller_tags == (10, 30, 70, 85, 100)


def test_frame_config_matches_frameopt():
    # OpenPyStruct_FrameOpt_Discrete_Beta.py:17-44 (the round-1 defect:
    # five of these were wrong — VERDICT.md Weak #2).
    cfg = FrameConfig()
    assert cfg.E == 200e9           # :26
    assert cfg.nu == 0.3            # :27
    assert cfg.A == 0.02            # :29
    assert cfg.bay_width == 6.0     # :22
    assert cfg.story_height == 3.0  # :23
    assert cfg.I0 == 5e-4           # :30
    assert cfg.udl == -1e4          # :38 vertical_load
    assert cfg.lateral_load == 1e4  # :37
    assert cfg.lr == 0.005          # :42
    assert cfg.max_epochs == 5000   # :41
    assert cfg.tolerance == 1e-3    # :43
    assert cfg.patience == 10       # :44


def test_train_config_matches_fnn():
    # OpenPyStruct_FNN_MultiCase.py:35-51
    cfg = TrainConfig()
    assert cfg.n_cases == 6
    assert cfg.nelem == 100
    assert cfg.box_constraint_coeff == 5e-1
    assert cfg.hidden_units == 128
    assert cfg.dropout_rate == 0.5
    assert cfg.num_epochs == 500
    assert cfg.batch_size == 128
    assert cfg.patience == 10
    assert cfg.learning_rate == 2e-4
    assert cfg.weight_decay == 1e-2
    assert cfg.train_split == 0.8
    assert cfg.sigma_0 == 0.03
    assert cfg.gamma_noise == 0.97
    assert cfg.lr_gamma == 0.99
    assert cfg.initial_alpha == 0.5
    assert cfg.c == 1.0


# Per-family expected values, straight from each script's constants block.
# Columns: n_cases, hidden, dropout, batch, lr, wd, sigma_0, gamma_noise,
#          lr_gamma, c, box_coeff, nheads_pad, decoupled
_EXPECTED = {
    # OpenPyStruct_FNN_MultiCase.py:35-51
    "fnn": (6, 128, 0.5, 128, 2e-4, 1e-2, 0.03, 0.97, 0.99, 1.0, 5e-1,
            None, False),
    # OpenPyStruct_PINN_MultiCase.py:34-58
    "pinn": (6, 350, 0.5, 128, 5e-4, 1e-3, 0.01, 0.99, 0.98, 0.5, 1e-1,
             None, False),
    # OpenPyStruct_FNO_MultiCase_Beta.py:36-62
    "fno": (6, 512, 0.1, 512, 3e-3, 1e-6, 0.01, 0.95, 0.975, 0.5, 5e-1,
            None, False),
    # OpenPyStruct_GNN_MultiCase_Beta.py:37-55 (AdamW, :395)
    "gnn": (6, 128, 0.5, 512, 3e-3, 1e-2, 0.01, 0.99, 0.975, 0.5, 5e-1,
            None, True),
    # OpenPyStruct_TransformerDiffusionModule_MultiCase.py:36-60
    "tfd": (6, 256, 0.1, 512, 3e-3, 1e-4, 0.01, 0.90, 0.95, 0.5, 5e-1,
            8, False),
    # OpenPyStruct_Bayesian_TFDModule_MultiCase_Beta.py:36-65
    "bnn": (6, 512, 0.1, 512, 3e-4, 1e-6, 0.01, 0.95, 0.99, 0.5, 5e-1,
            24, False),
    # OpenPyStruct_Bayesian_TFDModule_Meta_MultiCase_Beta.py:36-65
    "bnn-meta": (8, 512, 0.01, 512, 3e-4, 1e-6, 0.01, 0.95, 0.99, 1.0, 5e-1,
                 24, False),
}


def test_family_hyperparameters_match_reference():
    assert set(FAMILIES) == set(_EXPECTED)
    for name, exp in _EXPECTED.items():
        (n_cases, hidden, dropout, batch, lr, wd, sigma_0, gamma_noise,
         lr_gamma, c, box, nheads_pad, decoupled) = exp
        spec = FAMILIES[name]
        t = spec.train
        assert t.n_cases == n_cases, name
        assert t.hidden_units == hidden, name
        assert t.dropout_rate == dropout, name
        assert t.batch_size == batch, name
        assert t.learning_rate == lr, name
        assert t.weight_decay == wd, name
        assert t.sigma_0 == sigma_0, name
        assert t.gamma_noise == gamma_noise, name
        assert t.lr_gamma == lr_gamma, name
        assert t.c == c, name
        assert t.box_constraint_coeff == box, name
        assert t.num_epochs == 500, name
        assert t.patience == 10, name
        assert t.initial_alpha == 0.5, name
        assert t.train_split == 0.8, name
        assert spec.nheads_pad == nheads_pad, name
        assert spec.decoupled_weight_decay == decoupled, name


def test_shared_scalar_constants():
    assert BNN_KL_SCALE == 1e-6   # Bayesian_TFDModule_MultiCase_Beta.py:57
    assert PINN_PENALTY == 1.5e-6  # PINN_MultiCase.py:58


def test_pinn_box_constraints_are_wired():
    """The reference PINN clamps predictions against min/max of the
    standardized train-label I-slice (OpenPyStruct_PINN_MultiCase.py:
    377-378,556-558); the penalty must NOT be silently zero."""
    import jax.numpy as jnp

    from openpystruct_tpu.families import build_family

    _, _, fit_kwargs = build_family("pinn", feat_dim=20, nelem=10,
                                    label_dim=10 + 2 * 11)
    builder = fit_kwargs["loss_fn_builder"]
    # labels: I-slice in [0, 1], aux slices far outside it
    Y = jnp.concatenate(
        [jnp.linspace(0.0, 1.0, 10)[None, :].repeat(4, 0),
         jnp.full((4, 22), 50.0)], axis=1,
    )
    loss_fn = builder(Y)
    alpha = jnp.asarray(0.5)
    inside = loss_fn(alpha, Y, Y)
    # predictions violating the I-slice box must be penalized
    Y_viol = Y.at[:, :10].add(10.0)
    outside = loss_fn(alpha, Y_viol, Y)
    # same L1/L2 distance but no box violation: shift an aux slice instead
    Y_aux = Y.at[:, 10:20].add(10.0)
    aux_only = loss_fn(alpha, Y_aux, Y)
    assert float(outside) > float(aux_only) + 1.0, (
        "I-slice box-constraint penalty is not active"
    )
    assert jnp.isfinite(inside)
