# Import-resolution stand-in for `requests` (HTTP transport; not used
# by the measured stages). Fails loudly if touched.
def __getattr__(name):
    raise NotImplementedError(f'requests.{name} is transport — outside the measured stages')
