SELECT COUNT(*) FROM posts as p, postLinks as pl WHERE pl.PostId = p.Id AND p.FavoriteCount>=5 AND pl.LinkTypeId=2 AND pl.CreationDate>='2013-04-26 12:45:45'::timestamp;
