"""10-user fixture mirroring the JSONPlaceholder /users response shape
(the reference's fixed source corpus — 10 nested records). Synthetic values;
covers all four phone-format CASE branches, duplicate emails, NULL/empty
websites, and multiple cities (FIXTURES.md §A synthesis recipe)."""

from __future__ import annotations


def _user(i, name, username, email, phone, website, city, company, lat="10.1", lng="-20.2"):
    return {
        "id": i,
        "name": name,
        "username": username,
        "email": email,
        "phone": phone,
        "website": website,
        "address": {
            "street": f"{i} Main St",
            "suite": f"Apt. {i}",
            "city": city,
            "zipcode": f"9{i:04d}-000{i}",
            "geo": {"lat": lat, "lng": lng},
        },
        "company": {
            "name": company,
            "catchPhrase": f"catchphrase {i}",
            "bs": f"bs {i}",
        },
    }


USERS_FIXTURE = [
    _user(1, "Leanne Graham", "Bret", "Sincere@april.biz", "1-770-736-8031 x56442", "hildegard.org", "Gwenborough", "Romaguera-Crona"),
    _user(2, "Ervin Howell", "Antonette", "Shanna@melissa.tv", "010-692-6593", "anastasia.net", "Wisokyburgh", "Deckow-Crist"),
    _user(3, "Clementine Bauch", "Samantha", "Nathan@yesenia.net", "(463) 123-4447", "", "McKenziehaven", "Romaguera-Jacobson"),
    _user(4, "Patricia Lebsack", "Karianne", "Julianne.OConner@kory.org", "493-170-9623 x156", "kale.biz", "Gwenborough", "Robel-Corkery"),
    _user(5, "Chelsey Dietrich", "Kamren", "Lucio_Hettinger@annie.ca", "(254)954-1289", None, "Roscoeview", "Keebler LLC"),
    _user(6, "Dennis Schulist", "Leopoldo_Corkery", "Karley_Dach@jasper.info", "1-477-935-8478 x6430", "ola.org", "South Christy", "Considine-Lockman"),
    _user(7, "Kurtis Weissnat", "Elwyn.Skiles", "Telly.Hoeger@billy.biz", "210-067-6132", "elvis.io", "Howemouth", "Johns Group"),
    _user(8, "Nicholas Runolfsdottir V", "Maxime_Nienow", "Sherwood@rosamond.me", "586-493-6943 x140", "jacynthe.com", "Aliyaview", "Abernathy Group"),
    _user(9, "Glenna Reichert", "Delphine", "Chaim_McDermott@dana.io", "(775)976-6794 x41206", "conrad.com", "Bartholomebury", "Yost and Sons"),
    _user(10, "Clementina DuBuque", "Moriah.Stanton", "Sincere@april.biz", "024-648-3804", "ambrose.net", "Gwenborough", "Hoeger LLC"),
]
