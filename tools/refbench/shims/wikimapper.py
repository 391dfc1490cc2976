# Stand-in for `wikimapper` (sqlite title->wikidata-id mapper). The
# measured stages use it only as a FALLBACK for members missing from
# db1; the export writes db1 entries for every member, so this should
# never resolve anything. Returning None mirrors the real mapper's
# miss behavior (the member is skipped); calls are counted so a run
# that leaned on the fallback is detectable.
calls = 0


class WikiMapper:
    def __init__(self, path=None):
        pass

    def title_to_id(self, title):
        global calls
        calls += 1
        return None
