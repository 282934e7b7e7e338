from . import ampyx_data, boeing747_data, bubbledancer_data, ampyx_ap2_settings

__all__ = ['ampyx_data', 'boeing747_data', 'bubbledancer_data', 'ampyx_ap2_settings']
