SELECT MIN(akt.title) AS aka_title, MIN(t.title) AS internet_movie_title
FROM aka_title akt, company_name cn, company_type ct, info_type it1, keyword k,
     movie_companies mc, movie_info mi, movie_keyword mk, title t
WHERE cn.country_code = '[us]' AND it1.info = 'release dates'
  AND mi.note LIKE '%internet%' AND t.production_year > 1990
  AND t.id = akt.movie_id AND t.id = mi.movie_id AND t.id = mk.movie_id AND t.id = mc.movie_id
  AND mk.movie_id = mi.movie_id AND mk.movie_id = mc.movie_id AND mk.movie_id = akt.movie_id
  AND mi.movie_id = mc.movie_id AND mi.movie_id = akt.movie_id AND mc.movie_id = akt.movie_id
  AND k.id = mk.keyword_id AND it1.id = mi.info_type_id AND cn.id = mc.company_id
  AND ct.id = mc.company_type_id;
