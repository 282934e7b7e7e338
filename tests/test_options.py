"""Options system and derived-scaling tests."""
import numpy as np
import pytest

from awebox_tpu.arch import Architecture
from awebox_tpu.options.options import Options
from awebox_tpu.options.kite_data import ampyx_ap2_settings


def make_ampyx_options():
    options = Options()
    ampyx_ap2_settings.set_ampyx_ap2_settings(options)
    options['user_options.system_model.architecture'] = {1: 0}
    options['user_options.trajectory.type'] = 'power_cycle'
    options['user_options.wind.model'] = 'power'
    options['user_options.wind.u_ref'] = 10.
    options['params.wind.z_ref'] = 100.0
    options['params.wind.power_wind.exp_ref'] = 0.15
    options['nlp.n_k'] = 40
    options['nlp.collocation.u_param'] = 'zoh'
    options['user_options.trajectory.lift_mode.phase_fix'] = 'simple'
    return options


def test_dotted_access_and_types():
    options = Options()
    options['user_options.wind.u_ref'] = 7.5
    assert options['user_options.wind.u_ref'] == 7.5
    with pytest.raises(KeyError):
        options['user_options.wind.not_an_option'] = 1.
    with pytest.raises(TypeError):
        options['user_options.wind.u_ref'] = 'fast'


def test_ampyx_derived_scaling():
    options = make_ampyx_options()
    arch = Architecture({1: 0})
    processed = options.build(arch)
    scal = processed['processed']['scaling']
    est = processed['processed']['estimates']

    # centripetal flight radius with groundspeed 15, acc_max 12 g
    np.testing.assert_allclose(est['flight_radius'], 15. ** 2 / (12 * 9.81), rtol=1e-12)
    np.testing.assert_allclose(scal['x']['q'], est['flight_radius'] * np.ones(3))
    np.testing.assert_allclose(scal['x']['dq10'], 15.)
    np.testing.assert_allclose(scal['x']['l_t'], 200.)
    # lambda scaling = average tether-force limit / l_t = (50+1800)/2/200
    np.testing.assert_allclose(scal['z']['lambda10'], (50. + 1800.) / 2. / 200., rtol=1e-12)
    # power-law wind at the estimated altitude ~ 200 sin(45deg)
    zz = 200. * np.sin(np.pi / 4.)
    u_alt = 10. * (np.sqrt(zz ** 2 + 1) / 100.) ** 0.15
    np.testing.assert_allclose(est['u_altitude'], u_alt, rtol=1e-12)
    np.testing.assert_allclose(scal['x']['dl_t'], u_alt / 3., rtol=1e-12)
    # energy scaling positive and of a sane magnitude (kJ-scale x period)
    assert est['energy'] > 1e3
    # ampyx CL estimate at alpha_max=9deg
    CL, CD = est['CL_CD']
    assert 1.2 < CL < 1.5
    assert 0.1 < CD < 0.25
    # constraint applicability: single kite disables anticollision
    assert processed['model']['model_bounds']['anticollision']['include'] is False
    # ddl_t control: bounds transferred to u
    assert processed['model']['system_bounds']['u']['ddl_t'] == [-2.4, 2.4]


def test_system_structure_6dof():
    from awebox_tpu.model.system import generate_structure
    options = make_ampyx_options()
    arch = Architecture({1: 0})
    processed = options.build(arch)
    layout, gc = generate_structure(processed, arch)
    assert gc == ['q10']
    x_names = layout.names('x')
    assert x_names == ['q10', 'dq10', 'omega10', 'r10', 'delta10', 'l_t', 'dl_t', 'e']
    assert layout.names('u') == ['f_fict10', 'm_fict10', 'ddelta10', 'ddl_t']
    assert layout.names('z') == ['lambda10']
    assert layout.names('theta') == ['diam_t', 't_f']
    assert layout.dims['x'] == 3 + 3 + 3 + 9 + 3 + 1 + 1 + 1
    assert layout.dims['xdot'] == layout.dims['x']


def test_system_structure_3dof_dual():
    from awebox_tpu.model.system import generate_structure
    options = make_ampyx_options()
    options['user_options.system_model.kite_dof'] = 3
    options['user_options.system_model.architecture'] = {1: 0, 2: 1, 3: 1}
    arch = Architecture({1: 0, 2: 1, 3: 1})
    processed = options.build(arch)
    layout, gc = generate_structure(processed, arch)
    assert gc == ['q10', 'q21', 'q31']
    assert 'coeff21' in layout.names('x')
    assert 'dcoeff21' in layout.names('u')
    assert layout.names('theta') == ['diam_t', 'l_s', 'diam_s', 't_f']
    # lambda tree scaling exists for all three tethers
    scal = processed['processed']['scaling']
    assert 'lambda21' in scal['z'] and 'lambda31' in scal['z']
