"""BubbleDancer RC glider data pack.

AVL-derived values; numbers match
/root/reference/awebox/opts/kite_data/bubbledancer_data.py:28-169.
"""
import numpy as np

from .ampyx_data import battery_model_parameters


def data_dict():
    d = {}
    d['name'] = 'bubbledancer'
    d['geometry'] = geometry()
    stab_derivs, aero_validity = aero()
    d['stab_derivs'] = stab_derivs
    d['aero_validity'] = aero_validity
    coeff_min = np.array([0, -80 * np.pi / 180.0])
    coeff_max = np.array([2, 80 * np.pi / 180.0])
    d['battery'] = battery_model_parameters(coeff_max, coeff_min)
    return d


def geometry():
    g = {}
    g['s_ref'] = 0.6541922
    g['b_ref'] = 2.9718
    g['c_ref'] = g['s_ref'] / g['b_ref']
    g['m_k'] = 0.9195
    g['ar'] = g['b_ref'] / g['c_ref']
    g['j'] = np.array([[0.2052, 0.0, 0.1702e-2],
                       [0.0, 0.7758e-1, 0.0],
                       [0.1702e-2, 0.0, 0.2790]])
    g['length'] = 1.534
    g['height'] = 0.26416
    g['delta_max'] = np.array([20., 30., 30.]) * np.pi / 180.
    g['ddelta_max'] = np.array([2., 2., 2.])
    g['c_root'] = 1.4 * g['c_ref']
    g['c_tip'] = 2. * g['c_ref'] - g['c_root']
    g['fuselage'] = True
    g['wing'] = True
    g['tail'] = True
    g['wing_profile'] = None
    g['r_tether'] = np.zeros((3, 1))
    return g


def aero():
    stab_derivs = {}
    stab_derivs['frame'] = {'force': 'wind', 'moment': 'control'}

    stab_derivs['CL'] = {'0': [0.700], 'alpha': [5.675616], 'deltae': [0.008059],
                         'p': [0.000008], 'q': [7.286214], 'r': [-0.000001]}
    stab_derivs['CD'] = {'0': [0.02862], 'alpha': [0.1, 1.3], 'deltae': [0.000284]}
    stab_derivs['CS'] = {'alpha': [-0.000003], 'beta': [-0.404699],
                         'deltar': [-0.003376], 'p': [-0.380742],
                         'q': [-0.000001], 'r': [0.294666]}
    stab_derivs['Cl'] = {'deltaa': [0.3], 'deltar': [-0.000076], 'p': [-0.634188],
                         'q': [-0.000002], 'r': [0.181038],
                         'alpha': [-0.000003], 'beta': [-0.257096]}
    stab_derivs['Cm'] = {'alpha': [-0.895625], 'deltae': [-0.027418], 'q': [-12.180685]}
    stab_derivs['Cn'] = {'deltar': [0.001245], 'alpha': [0.000001], 'beta': [0.057021],
                         'p': [-0.068262], 'r': [-0.066292]}

    aero_validity = {
        'alpha_max_deg': 20., 'alpha_min_deg': -20.,
        'beta_max_deg': 15., 'beta_min_deg': -15.,
    }
    return stab_derivs, aero_validity
