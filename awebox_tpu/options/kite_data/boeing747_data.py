"""Boeing 747 aircraft data pack.

Published handling-qualities data (Heffley & Jewell, NASA CR-2144); numbers
match /root/reference/awebox/opts/kite_data/boeing747_data.py:28-172.
"""
import numpy as np

from .ampyx_data import battery_model_parameters


def data_dict():
    d = {}
    d['name'] = 'boeing747'
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
    g['m_k'] = 288756.903
    g['s_ref'] = 510.9667
    g['b_ref'] = 59.643264
    g['c_ref'] = g['s_ref'] / g['b_ref']
    g['ar'] = g['b_ref'] / g['c_ref']
    g['j'] = np.array([[24.67588669e6, 0., 1.315143e6],
                       [0.0, 44.87757e6, 0.0],
                       [1.315143e6, 0.0, 67.38415e6]])
    g['delta_max'] = np.array([20., 30., 30.]) * np.pi / 180.
    g['ddelta_max'] = np.array([2., 2., 2.])
    g['length'] = g['b_ref']
    g['height'] = g['b_ref'] / 5.
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

    stab_derivs['CL'] = {'0': [1.11], 'alpha': [5.70], 'deltae': [0.338], 'q': [5.4]}
    stab_derivs['CS'] = {'beta': [-1.08], 'deltar': [0.179]}
    stab_derivs['CD'] = {'0': [0.102], 'alpha': [0.66]}
    stab_derivs['Cl'] = {'deltaa': [0.053], 'beta': [-0.281], 'p': [-0.502], 'r': [0.195]}
    stab_derivs['Cm'] = {'alpha': [-1.45], 'q': [-21.4]}
    stab_derivs['Cn'] = {'deltaa': [0.0083], 'deltar': [-0.112],
                         'beta': [0.184], 'p': [-0.222], 'r': [-0.36]}

    aero_validity = {
        'alpha_max_deg': 20., 'alpha_min_deg': -20.,
        'beta_max_deg': 15., 'beta_min_deg': -15.,
    }
    return stab_derivs, aero_validity
