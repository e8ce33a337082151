from .pages import generate_pages, pages_fixture_dir, FIXTURE_VERSION

__all__ = ["generate_pages", "pages_fixture_dir", "FIXTURE_VERSION"]
