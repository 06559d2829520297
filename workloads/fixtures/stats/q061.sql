SELECT COUNT(*) FROM posts as p, postLinks as pl WHERE pl.PostId = p.Id AND p.Score>=5 AND p.CommentCount>=5 AND p.FavoriteCount=36 AND pl.LinkTypeId<=3;
